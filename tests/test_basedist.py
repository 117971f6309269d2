"""Physics-as-oracle eigenstate tests — the crown jewels
(models reference tests/test_basedist.py:5-129).

Every Slater eigenstate must satisfy, for ALL x:

    -1/4 ∇²logp - 1/8 |∇logp|² + 1/2 Σr² = E_state     (logp = 2 log|Psi|)

to float64 precision.  This simultaneously validates orbitals, the Slater
primitives (incl. second-order differentiation), the Laplacian engine, and
FreeFermion.log_prob.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fermiflow_tpu.physics import HO2D, FreeFermion
from fermiflow_tpu.vmc import y_grad_laplacian

orb = HO2D()
bd = FreeFermion(orb)


def _local_energy(logp_fn, x, *args):
    @jax.jit
    def run(x, *args):
        logp, grad, lap = y_grad_laplacian(logp_fn, x, *args)
        kin = -0.25 * lap - 0.125 * jnp.sum(grad**2, axis=(-2, -1))
        return kin + 0.5 * jnp.sum(x**2, axis=(-2, -1))

    return run(x, *args)


def test_ground_state_eigenvalue(rng):
    """N=3 polarized ground state: Eloc == 5.0 exactly (BASELINE.md)."""
    nup = 3
    occ = np.arange(nup, dtype=np.int32)
    x = jax.random.normal(rng, (16, nup, 2), dtype=jnp.float64)
    eloc = _local_energy(lambda xs: bd.log_prob(occ, (), xs), x)
    np.testing.assert_allclose(np.asarray(eloc), 5.0, atol=1e-9)


def test_random_excited_state_eigenvalue(rng):
    occ, Es = orb.fermion_states_random(4, seed=7)
    x = jax.random.normal(rng, (8, 4, 2), dtype=jnp.float64)
    eloc = _local_energy(lambda xs: bd.log_prob(occ, (), xs), x)
    np.testing.assert_allclose(np.asarray(eloc), float(np.sum(Es)), atol=1e-9)


def test_two_spin_sectors_eigenvalue(rng):
    """Spin-up x spin-down product wavefunction (reference
    tests/test_basedist.py:45-60)."""
    nup, ndown = 3, 2
    occ_up = np.arange(nup, dtype=np.int32)
    occ_down = np.arange(ndown, dtype=np.int32)
    E_exact = float(np.sum(orb.Es[:nup]) + np.sum(orb.Es[:ndown]))
    x = jax.random.normal(rng, (8, nup + ndown, 2), dtype=jnp.float64)
    eloc = _local_energy(lambda xs: bd.log_prob(occ_up, occ_down, xs), x)
    np.testing.assert_allclose(np.asarray(eloc), E_exact, atol=1e-9)


def test_multstates_eigenvalues(rng):
    """Mixed-state batch: each walker's Eloc equals ITS state's energy
    (reference tests/test_basedist.py:62-129)."""
    nup = 6
    occ_table, Es = orb.fermion_states(nup, 0, 2.0)
    k1, k2 = jax.random.split(rng)
    batch = 24
    idx = jax.random.randint(k1, (batch,), 0, occ_table.shape[0])
    x = jax.random.normal(k2, (batch, nup, 2), dtype=jnp.float64)
    occ_dev = jnp.asarray(occ_table)
    eloc = _local_energy(
        lambda xs, i: bd.log_prob_multstates(occ_dev, i, xs), x, idx
    )
    np.testing.assert_allclose(
        np.asarray(eloc), np.asarray(Es)[np.asarray(idx)], atol=1e-8
    )


def test_metropolis_sampler_moments(rng):
    """Distributional check the reference lacks (SURVEY.md §4 gap): for the
    single-particle ground state, p(r) ∝ e^{-r²}, so <x²> = 1/2 per
    coordinate and <r²> = 1."""
    occ = np.array([0], dtype=np.int32)
    x = bd.sample(occ, (), rng, (4000,), equilibrium_steps=300, tau=0.5)
    r2 = np.asarray(jnp.sum(x**2, axis=(-2, -1)))
    assert abs(r2.mean() - 1.0) < 0.05, r2.mean()
    # <r⁴> = 2 for a 2D standard Gaussian with variance 1/2 per coord.
    assert abs((r2**2).mean() - 2.0) < 0.2


def test_sample_multstates_shapes(rng):
    occ_table, _ = orb.fermion_states(3, 0, 2.0)
    idx = jnp.zeros(32, dtype=jnp.int32)
    x = bd.sample_multstates(
        jnp.asarray(occ_table), idx, rng, equilibrium_steps=10
    )
    assert x.shape == (32, 3, 2)
    assert jnp.all(jnp.isfinite(x))
