"""MLP and backflow tests: analytic derivatives vs autodiff, equivariance
(models reference tests/test_MLP.py and tests/test_equivariant_funs.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from fermiflow_tpu.nn import (
    backflow_apply,
    backflow_divergence,
    backflow_init_gaussian,
    backflow_init_zeros,
    mlp_apply,
    mlp_grad,
    mlp_init_gaussian,
    mlp_init_zeros,
)
from fermiflow_tpu.vmc import divergence_fwd


def test_mlp_analytic_grad_matches_autodiff(rng):
    params = mlp_init_gaussian(rng, 1, 32, std=0.5)
    x = jax.random.normal(jax.random.PRNGKey(3), (10, 4, 1), dtype=jnp.float64)
    g_analytic = mlp_grad(params, x)
    g_auto = jax.vmap(jax.vmap(jax.jacobian(lambda xi: mlp_apply(params, xi)[0])))(x)
    np.testing.assert_allclose(
        np.asarray(g_analytic), np.asarray(g_auto), atol=1e-12
    )


def test_mlp_zero_init_is_zero():
    params = mlp_init_zeros(1, 16)
    x = jnp.linspace(-2, 2, 9)[:, None]
    np.testing.assert_array_equal(np.asarray(mlp_apply(params, x)), 0.0)
    np.testing.assert_array_equal(np.asarray(mlp_grad(params, x)), 0.0)


def test_mlp_seeded_init_reproducible():
    k = jax.random.PRNGKey(7)
    p1 = mlp_init_gaussian(k, 1, 8)
    p2 = mlp_init_gaussian(k, 1, 8)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_backflow_equivariance(rng):
    """v(perm(x)) == perm(v(x)) (reference tests/test_equivariant_funs.py:4-35)."""
    params = backflow_init_gaussian(rng, 16, 16, std=0.3)
    x = jax.random.normal(jax.random.PRNGKey(5), (6, 5, 2), dtype=jnp.float64)
    perm = np.array([2, 0, 4, 1, 3])
    v = backflow_apply(params, x)
    v_p = backflow_apply(params, x[:, perm, :])
    np.testing.assert_allclose(np.asarray(v[:, perm, :]), np.asarray(v_p), atol=1e-12)
    # divergence is permutation-invariant
    np.testing.assert_allclose(
        np.asarray(backflow_divergence(params, x)),
        np.asarray(backflow_divergence(params, x[:, perm, :])),
        atol=1e-12,
    )


def test_backflow_analytic_divergence_vs_autodiff(rng):
    """Hand-derived divergence == tr(∂v/∂x) by forward autodiff, with and
    without the one-body term."""
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 5, 2), dtype=jnp.float64)
    for d_mu in (16, None):
        params = backflow_init_gaussian(rng, 16, d_mu, std=0.3)
        div_analytic = backflow_divergence(params, x)
        div_auto = divergence_fwd(lambda xs: backflow_apply(params, xs), x)
        np.testing.assert_allclose(
            np.asarray(div_analytic), np.asarray(div_auto), atol=1e-10
        )


def test_backflow_zero_init_identity_flow():
    params = backflow_init_zeros(8, 8)
    x = jnp.ones((2, 3, 2), dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(backflow_apply(params, x)), 0.0)
    np.testing.assert_array_equal(np.asarray(backflow_divergence(params, x)), 0.0)


def test_backflow_unbatched_works(rng):
    """The same definition must serve the per-walker Laplacian path."""
    params = backflow_init_gaussian(rng, 8, 8, std=0.3)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 2), dtype=jnp.float64)
    v_single = backflow_apply(params, x)
    v_batched = backflow_apply(params, x[None])[0]
    np.testing.assert_allclose(np.asarray(v_single), np.asarray(v_batched), atol=1e-14)
