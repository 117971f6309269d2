"""Batched small-n Gaussian-elimination log|det| vs LAPACK slogdet:
values and derivatives to second order, both autodiff modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermiflow_tpu.ops import logabsdet


@pytest.mark.parametrize("n", [1, 2, 3, 6, 10])
def test_values_match_slogdet(n, rng):
    D = jax.random.normal(rng, (64, n, n), dtype=jnp.float64)
    want = jnp.linalg.slogdet(D)[1]
    got = logabsdet(D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


def test_extra_batch_dims(rng):
    D = jax.random.normal(rng, (4, 5, 3, 3), dtype=jnp.float64)
    want = jnp.linalg.slogdet(D)[1]
    np.testing.assert_allclose(
        np.asarray(logabsdet(D)), np.asarray(want), atol=1e-12
    )


def test_reverse_gradient_matches(rng):
    D = jax.random.normal(rng, (6, 6), dtype=jnp.float64)
    g_ge = jax.grad(lambda d: logabsdet(d))(D)
    g_lu = jax.grad(lambda d: jnp.linalg.slogdet(d)[1])(D)
    np.testing.assert_allclose(np.asarray(g_ge), np.asarray(g_lu), atol=1e-12)


def test_nested_forward_derivatives_match(rng):
    """1st and 2nd directional derivatives (the Laplacian engine's pattern)."""
    k1, k2 = jax.random.split(rng)
    D = jax.random.normal(k1, (6, 6), dtype=jnp.float64)
    V = jax.random.normal(k2, (6, 6), dtype=jnp.float64)

    def derivs(f):
        d1 = jax.jvp(f, (0.0,), (1.0,))[1]
        d2 = jax.jvp(lambda t: jax.jvp(f, (t,), (1.0,))[1], (0.0,), (1.0,))[1]
        return float(d1), float(d2)

    d1_ge, d2_ge = derivs(lambda t: logabsdet(D + t * V))
    d1_lu, d2_lu = derivs(lambda t: jnp.linalg.slogdet(D + t * V)[1])
    np.testing.assert_allclose(d1_ge, d1_lu, atol=1e-10)
    np.testing.assert_allclose(d2_ge, d2_lu, atol=1e-9)


def test_permuted_rows_give_same_logabs(rng):
    D = jax.random.normal(rng, (8, 5, 5), dtype=jnp.float64)
    perm = np.array([3, 1, 4, 0, 2])
    np.testing.assert_allclose(
        np.asarray(logabsdet(D)),
        np.asarray(logabsdet(D[:, perm, :])),
        atol=1e-12,
    )


def test_ill_conditioned_stays_finite(rng):
    """Graceful behavior at (near-)singularity: large-negative, not NaN."""
    D = jax.random.normal(rng, (4, 4), dtype=jnp.float64)
    D = D.at[3].set(D[2])  # exactly repeated row
    v = float(logabsdet(D))
    assert not np.isnan(v)
    assert v < -30
