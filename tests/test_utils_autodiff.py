"""Closed-form checks of the autodiff utilities and library-semantics
characterization tests (models reference tests/test_utils.py and
tests/test_distributions.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from fermiflow_tpu.vmc import divergence_fwd, y_grad_laplacian


def test_y_grad_laplacian_polynomial(rng):
    """f(x) = sum x^3: grad = 3x², laplacian = 6 sum x (closed form)."""
    x = jax.random.normal(rng, (5, 3, 2), dtype=jnp.float64)

    def f(xs):
        return jnp.sum(xs**3)

    y, g, lap = y_grad_laplacian(f, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(jnp.sum(x**3, axis=(1, 2))), atol=1e-12)
    np.testing.assert_allclose(np.asarray(g), np.asarray(3 * x**2), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(lap), np.asarray(6 * jnp.sum(x, axis=(1, 2))), atol=1e-12
    )


def test_y_grad_laplacian_modes_and_chunks_agree(rng):
    x = jax.random.normal(rng, (8, 2, 2), dtype=jnp.float64)

    def f(xs):
        return jnp.sum(jnp.sin(xs) * xs**2)

    out_ff = y_grad_laplacian(f, x, mode="fwdfwd")
    out_fr = y_grad_laplacian(f, x, mode="fwdrev")
    out_ch = y_grad_laplacian(f, x, chunk_size=4)
    for a, b in zip(out_ff, out_fr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)
    for a, b in zip(out_ff, out_ch):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_divergence_polynomial(rng):
    """v(x) = x³ componentwise: div = sum 3x²."""
    x = jax.random.normal(rng, (4, 3, 2), dtype=jnp.float64)
    div = divergence_fwd(lambda xs: xs**3, x)
    np.testing.assert_allclose(
        np.asarray(div), np.asarray(jnp.sum(3 * x**2, axis=(1, 2))), atol=1e-12
    )


# ---- library-semantics characterization (reference tests/test_distributions.py
# pins torch.distributions.Categorical; these pin the jax.random/log_softmax
# semantics the finite-T occupation model relies on) ----


def test_categorical_sampling_frequencies(rng):
    logits = jnp.asarray([0.0, 1.0, 2.0], dtype=jnp.float64)
    idx = jax.random.categorical(rng, logits, shape=(20000,))
    p_emp = np.bincount(np.asarray(idx), minlength=3) / 20000
    p_true = np.asarray(jax.nn.softmax(logits))
    np.testing.assert_allclose(p_emp, p_true, atol=0.02)


def test_log_softmax_gradient_semantics(rng):
    """d/dlogits of log p[i] = e_i - softmax — the phi-loss gradient core
    (reference tests/test_distributions.py:102-134)."""
    logits = jax.random.normal(rng, (5,), dtype=jnp.float64)
    i = 3
    g = jax.grad(lambda l: jax.nn.log_softmax(l)[i])(logits)
    want = np.zeros(5)
    want[i] = 1.0
    want -= np.asarray(jax.nn.softmax(logits))
    np.testing.assert_allclose(np.asarray(g), want, atol=1e-12)


def test_large_n_eigenstate_gate(rng):
    """N=10 polarized at Z=0: Eloc == 30.0 (the large-N config of
    BASELINE.json; exercises 10x10 determinants and a 20-dim Laplacian)."""
    from fermiflow_tpu.physics import HO2D, FreeFermion

    orb = HO2D()
    bd = FreeFermion(orb)
    occ = np.arange(10, dtype=np.int32)
    x = jax.random.normal(rng, (4, 10, 2), dtype=jnp.float64)

    @jax.jit
    def eloc_of(x):
        logp, g, lap = y_grad_laplacian(lambda xs: bd.log_prob(occ, (), xs), x)
        return -0.25 * lap - 0.125 * jnp.sum(g**2, axis=(-2, -1)) + 0.5 * jnp.sum(
            x**2, axis=(-2, -1)
        )

    np.testing.assert_allclose(np.asarray(eloc_of(x)), 30.0, atol=1e-8)
