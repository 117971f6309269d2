"""Slater-determinant primitive tests: antisymmetry, multstate consistency,
derivative correctness (models reference tests/test_slater.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from fermiflow_tpu.physics import (
    HO2D,
    log_abs_slater_det,
    log_abs_slater_det_multstates,
    slater_matrix,
    slater_matrix_multstates,
)

orb = HO2D()


def test_slater_matrix_columns_are_orbitals(rng):
    n = 4
    occ = np.array([0, 2, 5, 9], dtype=np.int32)
    x = jax.random.normal(rng, (6, n, 2), dtype=jnp.float64)
    D = slater_matrix(orb, occ, x)
    all_vals = orb.eval_all(x)  # (6, n, 36)
    np.testing.assert_allclose(
        np.asarray(D), np.asarray(all_vals[..., occ]), atol=1e-12
    )


def test_antisymmetry(rng):
    """log|det| invariant under particle exchange; sign flips
    (reference tests/test_slater.py:4-33)."""
    n = 5
    occ, _ = orb.fermion_states_random(n, seed=1)
    x = jax.random.normal(rng, (8, n, 2), dtype=jnp.float64)
    # Even permutation (two transpositions): log|det| and sign both invariant.
    perm_even = np.array([1, 0, 3, 2, 4])
    logd = log_abs_slater_det(orb, occ, x)
    logd_p = log_abs_slater_det(orb, occ, x[:, perm_even, :])
    np.testing.assert_allclose(np.asarray(logd), np.asarray(logd_p), atol=1e-10)

    # Odd permutation (single transposition): sign must flip.
    perm = np.array([1, 0, 2, 3, 4])
    np.testing.assert_allclose(
        np.asarray(logd),
        np.asarray(log_abs_slater_det(orb, occ, x[:, perm, :])),
        atol=1e-10,
    )
    D = slater_matrix(orb, occ, x)
    D_p = slater_matrix(orb, occ, x[:, perm, :])
    s, _ = jnp.linalg.slogdet(D)
    s_p, _ = jnp.linalg.slogdet(D_p)
    np.testing.assert_array_equal(np.asarray(s), -np.asarray(s_p))


def test_multstates_matches_static_per_state(rng):
    """The dense one-hot multstate build equals the static build state by
    state (replaces the reference's Counter-segment cross-check)."""
    n = 3
    occ_table, _ = orb.fermion_states(n, 0, 2.0)
    batch = 32
    k1, k2 = jax.random.split(rng)
    state_idx = jax.random.randint(k1, (batch,), 0, occ_table.shape[0])
    x = jax.random.normal(k2, (batch, n, 2), dtype=jnp.float64)

    got = log_abs_slater_det_multstates(
        orb, jnp.asarray(occ_table), state_idx, x
    )
    want = np.empty(batch)
    for b in range(batch):
        want[b] = float(
            log_abs_slater_det(orb, occ_table[int(state_idx[b])], x[b])
        )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)

    D = slater_matrix_multstates(orb, jnp.asarray(occ_table), state_idx, x)
    for b in range(0, batch, 7):
        Db = slater_matrix(orb, occ_table[int(state_idx[b])], x[b])
        np.testing.assert_allclose(np.asarray(D[b]), np.asarray(Db), atol=1e-12)


def test_gradient_and_laplacian_vs_finite_difference(rng):
    """1st/2nd derivatives of log|det| through slogdet autodiff vs central
    finite differences (derivative-correctness check in the spirit of
    reference tests/test_slater.py:65-127)."""
    n = 3
    occ = np.arange(n, dtype=np.int32)
    x = jax.random.normal(rng, (n, 2), dtype=jnp.float64)

    f = lambda xi: log_abs_slater_det(orb, occ, xi)
    g = jax.grad(f)(x)
    H = jax.hessian(f)(x)

    eps = 1e-5
    eps2 = 5e-4  # wider stencil for the 2nd difference (roundoff ~ ulp/eps²)
    for i in range(n):
        for d in range(2):
            dx = jnp.zeros_like(x).at[i, d].set(eps)
            fd = (f(x + dx) - f(x - dx)) / (2 * eps)
            np.testing.assert_allclose(float(g[i, d]), float(fd), atol=1e-7)
            dx2 = jnp.zeros_like(x).at[i, d].set(eps2)
            fdd = (f(x + dx2) - 2 * f(x) + f(x - dx2)) / eps2**2
            np.testing.assert_allclose(
                float(H[i, d, i, d]), float(fdd), rtol=1e-5, atol=1e-6
            )


def test_multstates_grad_matches_static_grad(rng):
    n = 3
    occ_table, _ = orb.fermion_states(n, 0, 2.0)
    k1, k2 = jax.random.split(rng)
    idx = jax.random.randint(k1, (4,), 0, occ_table.shape[0])
    x = jax.random.normal(k2, (4, n, 2), dtype=jnp.float64)

    g_mult = jax.vmap(
        jax.grad(
            lambda xi, i: log_abs_slater_det_multstates(
                orb, jnp.asarray(occ_table), i, xi
            )
        )
    )(x, idx)
    for b in range(4):
        g_stat = jax.grad(
            lambda xi: log_abs_slater_det(orb, occ_table[int(idx[b])], xi)
        )(x[b])
        np.testing.assert_allclose(
            np.asarray(g_mult[b]), np.asarray(g_stat), atol=1e-10
        )


def test_closed_form_vgh_matches_autodiff(rng):
    """The determinant-calculus (value, grad, Hessian) of the base density
    (physics/slater.logdet_vgh via FreeFermion.log_prob_vgh) must equal the
    nested-autodiff reference implementation exactly — polarized, two-spin-
    sector, and per-walker multistate."""
    from fermiflow_tpu.physics import FreeFermion
    from fermiflow_tpu.vmc.hessian_flow import base_val_grad_hess

    bd = FreeFermion(orb)
    k1, k2, k3, k4 = jax.random.split(rng, 4)

    occ = tuple(range(6))
    x = jax.random.normal(k1, (16, 6, 2), dtype=jnp.float64)
    ref = base_val_grad_hess(lambda z: bd.log_prob(occ, (), z), x)
    got = jax.jit(lambda z: bd.log_prob_vgh(occ, (), z))(x)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-8)

    x = jax.random.normal(k2, (16, 5, 2), dtype=jnp.float64)
    ref = base_val_grad_hess(
        lambda z: bd.log_prob((0, 1, 2), (0, 1), z), x
    )
    got = jax.jit(lambda z: bd.log_prob_vgh((0, 1, 2), (0, 1), z))(x)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-8)

    occ_tab, _ = orb.fermion_states(4, 0, 2.0)
    occ_tab = jnp.asarray(occ_tab)
    idx = jax.random.randint(k3, (16,), 0, occ_tab.shape[0])
    x = jax.random.normal(k4, (16, 4, 2), dtype=jnp.float64)
    ref = base_val_grad_hess(
        lambda z, i: bd.log_prob_multstates(occ_tab, i[None], z[None])[0],
        x, idx,
    )
    got = jax.jit(
        lambda z, i: bd.log_prob_vgh_multstates(occ_tab, i, z)
    )(x, idx)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-8)


def test_gauss_jordan_inv_matches_linalg(rng):
    from fermiflow_tpu.ops.logdet import gauss_jordan_inv

    D = jax.random.normal(rng, (64, 7, 7), dtype=jnp.float64)
    inv = gauss_jordan_inv(D)
    np.testing.assert_allclose(
        np.asarray(inv), np.asarray(jnp.linalg.inv(D)), atol=1e-8
    )
    resid = jnp.einsum("bij,bjk->bik", D, inv) - jnp.eye(7, dtype=jnp.float64)
    assert float(jnp.max(jnp.abs(resid))) < 1e-8
