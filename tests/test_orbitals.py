"""Orbital-set tests: closed-form parity, eigenfunction property, state counts.

Models the reference's physics-as-oracle strategy (tests/test_basedist.py) and
its state-enumeration anchors (src/orbitals.py __main__)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermiflow_tpu.physics import HO2D, hermite_functions

orb = HO2D()


def _reference_orbitals_1d():
    """The reference's hand-coded normalized Hermite factors
    (src/orbitals.py:66-75)."""
    return [
        lambda x: np.ones_like(x),
        lambda x: np.sqrt(2) * x,
        lambda x: 1 / np.sqrt(2) * (2 * x**2 - 1),
        lambda x: 1 / np.sqrt(3) * (2 * x**3 - 3 * x),
        lambda x: 1 / np.sqrt(6) * (2 * x**4 - 6 * x**2 + 1.5),
        lambda x: 1 / np.sqrt(15) * (2 * x**5 - 10 * x**3 + 7.5 * x),
        lambda x: 1 / np.sqrt(5) * (2 / 3 * x**6 - 5 * x**4 + 7.5 * x**2 - 1.25),
        lambda x: 1 / np.sqrt(70) * (4 / 3 * x**7 - 14 * x**5 + 35 * x**3 - 17.5 * x),
    ]


def test_hermite_matches_reference_closed_forms():
    x = np.linspace(-3, 3, 41)
    hs = np.asarray(hermite_functions(jnp.asarray(x), 8))
    for n, f in enumerate(_reference_orbitals_1d()):
        np.testing.assert_allclose(hs[:, n], f(x), atol=1e-12, rtol=1e-12)


def test_orbital_energies_and_degeneracies():
    assert orb.num_orbitals == 36
    np.testing.assert_array_equal(
        orb.Es, [n + 1 for n in range(8) for _ in range(n + 1)]
    )
    for n in range(8):
        idx = orb.E_indices(n)
        assert len(idx) == n + 1
        assert all(orb.Es[i] == n + 1 for i in idx)


def test_single_orbital_eigenfunction_property(rng):
    """Each orbital is an exact eigenfunction: -1/2 ∇²φ + 1/2 r² φ = E φ."""
    x = jax.random.normal(rng, (7, 2), dtype=jnp.float64)

    for m in [0, 1, 4, 10, 20, 35]:
        def phi(xi):
            return orb.eval_orbitals(np.array([m]), xi)[0]

        for xi in x:
            lap = jnp.trace(jax.hessian(phi)(xi))
            E_local = -0.5 * lap / phi(xi) + 0.5 * jnp.sum(xi**2)
            np.testing.assert_allclose(float(E_local), float(orb.Es[m]), atol=1e-9)


def test_orbital_orthonormality_quadrature():
    """Gauss-Hermite-style check on a dense grid: <phi_i|phi_j> = delta_ij."""
    g = np.linspace(-7, 7, 701)
    dx = g[1] - g[0]
    X, Y = np.meshgrid(g, g, indexing="ij")
    pts = jnp.asarray(np.stack([X.ravel(), Y.ravel()], axis=-1))
    vals = np.asarray(orb.eval_all(pts))  # (npts, 36)
    sub = vals[:, [0, 1, 2, 5, 9]]
    G = sub.T @ sub * dx * dx
    np.testing.assert_allclose(G, np.eye(5), atol=1e-6)


@pytest.mark.parametrize(
    "N,deltaE,count",
    [(3, 2, 21), (6, 2, 54), (6, 4, 524), (10, 4, 1781), (6, 0, 1), (6, 1, 13),
     (6, 3, 186)],
)
def test_state_counts(N, deltaE, count):
    """Truncated-space sizes (BASELINE.md anchors; src/orbitals.py:101-110)."""
    occ, Es = orb.fermion_states(N, 0, deltaE)
    assert occ.shape == (count, N)
    assert np.all(np.diff(Es) >= 0)  # sorted by energy
    assert Es[0] == np.sum(orb.Es[:N])  # ground state first


@pytest.mark.parametrize("N,deltaE", [(3, 2), (6, 3)])
def test_states_match_naive_enumeration(N, deltaE):
    occ, Es = orb.fermion_states(N, 0, deltaE)
    occ_n, Es_n = orb.fermion_states_naive(N, 0, deltaE)
    assert sorted(map(tuple, occ)) == sorted(map(tuple, occ_n))
    np.testing.assert_array_equal(Es, Es_n)


def test_ground_state_energies():
    """E0 anchors: N=3 -> 5, N=6 -> 14, N=10 -> 30 (BASELINE.md)."""
    for N, E0 in [(3, 5.0), (6, 14.0), (10, 30.0)]:
        assert float(np.sum(orb.Es[:N])) == E0


def test_fermion_states_random():
    idx, Es = orb.fermion_states_random(5, seed=0)
    assert len(idx) == 5
    assert len(set(idx.tolist())) == 5
    np.testing.assert_array_equal(Es, orb.Es[idx])


def test_arbitrary_shell_count():
    """The TPU build is not capped at 8 shells like the reference."""
    big = HO2D(num_shells=12)
    assert big.num_orbitals == 12 * 13 // 2
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 2)))
    v = big.eval_all(x)
    assert v.shape == (4, big.num_orbitals)
    np.testing.assert_allclose(
        np.asarray(v[:, :36]), np.asarray(orb.eval_all(x)), atol=1e-12
    )


def test_polarized_only_guard():
    with pytest.raises(ValueError):
        orb.fermion_states(3, 1, 2.0)
