"""Fused Pallas Metropolis kernel tests.

The deterministic part (in-kernel Slater log-density) is validated on CPU via
the TPU-flavored interpreter.  The PRNG-dependent full-chain behavior
(acceptance rates, sampler moments) can only run on real TPU hardware — the
interpreter stubs ``prng_random_bits`` to zeros — so those tests are
TPU-gated (they run in the bench environment, not CPU CI).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermiflow_tpu.physics import HO2D, FreeFermion

orb = HO2D()
bd = FreeFermion(orb)

# The CPU test env pins jax_default_device to a CPU even when a TPU backend
# exists, so gate on the effective default device, not the device list.
_dd = jax.config.jax_default_device
on_tpu = (_dd.platform if _dd is not None else jax.devices()[0].platform) == "tpu"
needs_tpu = pytest.mark.skipif(not on_tpu, reason="needs real TPU PRNG")


def _occ_tuples(n):
    occ = np.arange(n, dtype=np.int32)
    return (
        occ,
        tuple(int(v) for v in orb.nx[occ]),
        tuple(int(v) for v in orb.ny[occ]),
    )


def test_kernel_logp_matches_free_fermion_interpret():
    """steps=0 chain: the kernel's in-register Slater logp must equal
    FreeFermion.log_prob (runs in the interpreter, CPU-safe)."""
    from fermiflow_tpu.ops.pallas_metropolis import metropolis_free_fermion

    occ, nx_occ, ny_occ = _occ_tuples(3)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (128, 3, 2), dtype=jnp.float32)
    x, logp, acc = metropolis_free_fermion(
        x0, 7, 0.1, 0, nx_occ, ny_occ, interpret=True
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-6)
    want = bd.log_prob(occ, (), x0)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(want), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(acc), 0.0)


@needs_tpu
def test_kernel_chain_acceptance_and_logp():
    from fermiflow_tpu.ops.pallas_metropolis import metropolis_free_fermion

    occ, nx_occ, ny_occ = _occ_tuples(6)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1024, 6, 2), dtype=jnp.float32)
    x, logp, acc = metropolis_free_fermion(x0, 7, 0.1, 100, nx_occ, ny_occ)
    assert 0.6 < float(acc.mean()) < 0.85
    want = bd.log_prob(occ, (), x)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(want), atol=1e-4)


@needs_tpu
def test_kernel_sampler_moments():
    """Single-particle ground state: <r²> = 1, <r⁴> = 2."""
    from fermiflow_tpu.ops.pallas_metropolis import metropolis_free_fermion

    x0 = jax.random.normal(jax.random.PRNGKey(1), (4096, 1, 2), dtype=jnp.float32)
    x, _, acc = metropolis_free_fermion(x0, 3, 0.5, 300, (0,), (0,))
    r2 = np.asarray(jnp.sum(x**2, axis=(-2, -1)))
    assert abs(r2.mean() - 1.0) < 0.05
    assert abs((r2**2).mean() - 2.0) < 0.2


def test_multistate_kernel_logp_matches_interpret():
    """steps=0: the mixed-state kernel's in-register log density equals
    FreeFermion.log_prob_multstates (interpreter, CPU-safe)."""
    from fermiflow_tpu.ops.pallas_metropolis import (
        metropolis_free_fermion_multistate,
    )

    occ_table, _ = orb.fermion_states(3, 0, 2.0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    B = 256
    idx = jax.random.randint(k1, (B,), 0, occ_table.shape[0])
    x0 = jax.random.normal(k2, (B, 3, 2), dtype=jnp.float32)
    occ = jnp.take(jnp.asarray(occ_table), idx, axis=0)
    nx = jnp.take(jnp.asarray(orb.nx), occ)
    ny = jnp.take(jnp.asarray(orb.ny), occ)
    x, logp, acc = metropolis_free_fermion_multistate(
        x0, 7, 0.1, 0, nx, ny, interpret=True
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-6)
    want = bd.log_prob_multstates(jnp.asarray(occ_table), idx, x0)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(want), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(acc), 0.0)


def test_sharded_wrappers_match_single_device_interpret():
    """shard_map-wrapped kernels over the 8-virtual-CPU walker mesh must
    reproduce the single-launch results (steps=0 → RNG-independent)."""
    from fermiflow_tpu.ops.pallas_metropolis import (
        metropolis_free_fermion,
        metropolis_free_fermion_multistate_sharded,
        metropolis_free_fermion_sharded,
    )
    from fermiflow_tpu.parallel import make_walker_mesh

    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_walker_mesh(cpus)

    occ, nx_occ, ny_occ = _occ_tuples(3)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (256, 3, 2), dtype=jnp.float32)
    x_s, logp_s, acc_s = metropolis_free_fermion_sharded(
        mesh, x0, 7, 0.1, 0, nx_occ, ny_occ, interpret=True
    )
    x_u, logp_u, _ = metropolis_free_fermion(
        x0, 7, 0.1, 0, nx_occ, ny_occ, interpret=True
    )
    assert len(x_s.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_u), atol=1e-6)
    np.testing.assert_allclose(np.asarray(logp_s), np.asarray(logp_u), atol=1e-4)

    occ_table, _ = orb.fermion_states(3, 0, 2.0)
    idx = jax.random.randint(jax.random.PRNGKey(1), (256,), 0, occ_table.shape[0])
    occm = jnp.take(jnp.asarray(occ_table), idx, axis=0)
    nx = jnp.take(jnp.asarray(orb.nx), occm)
    ny = jnp.take(jnp.asarray(orb.ny), occm)
    xm, logpm, _ = metropolis_free_fermion_multistate_sharded(
        mesh, x0, 7, 0.1, 0, nx, ny, interpret=True
    )
    want = bd.log_prob_multstates(jnp.asarray(occ_table), idx, x0)
    assert len(xm.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(logpm), np.asarray(want), atol=1e-3)


def test_sharded_pallas_train_step_runs_interpret():
    """Full GS train step with the sharded Pallas sampler (interpret mode) on
    the 8-virtual-CPU mesh: compiles, executes, keeps walkers sharded."""
    import optax

    from fermiflow_tpu.cli import common
    from fermiflow_tpu.config import Config
    from fermiflow_tpu.parallel import make_walker_mesh, shard_walkers
    from fermiflow_tpu.train import init_gs_state, make_gs_train_step

    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_walker_mesh(cpus)
    cfg = Config(
        nup=3, Z=0.5, batch=64, d_eta=8, d_mu=8, ode_steps=2,
        equilibrium_steps=2, dtype="float32",
        pallas_sampler=True, pallas_interpret=True,
    )
    model, params = common.build_gs(cfg)
    opt = optax.adam(cfg.lr)
    state = init_gs_state(model, params, cfg, opt)
    state = state._replace(
        walkers=shard_walkers(mesh, state.walkers),
        tau=shard_walkers(mesh, state.tau),
    )
    step = make_gs_train_step(model, opt, cfg, mesh=mesh)
    state, metrics = step(state)
    assert np.isfinite(float(metrics["E"]))
    assert len(state.walkers.sharding.device_set) == 8


@needs_tpu
def test_multistate_kernel_chain():
    from fermiflow_tpu.ops.pallas_metropolis import (
        metropolis_free_fermion_multistate,
    )

    occ_table, _ = orb.fermion_states(6, 0, 2.0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    B = 1024
    idx = jax.random.randint(k1, (B,), 0, occ_table.shape[0])
    x0 = jax.random.normal(k2, (B, 6, 2), dtype=jnp.float32)
    occ = jnp.take(jnp.asarray(occ_table), idx, axis=0)
    nx = jnp.take(jnp.asarray(orb.nx), occ)
    ny = jnp.take(jnp.asarray(orb.ny), occ)
    x, logp, acc = metropolis_free_fermion_multistate(x0, 7, 0.1, 100, nx, ny)
    assert 0.55 < float(acc.mean()) < 0.9
    want = bd.log_prob_multstates(jnp.asarray(occ_table), idx, x)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(want), atol=1e-3)


def test_kernel_logp_two_spin_sectors_interpret():
    """steps=0, nup=2/ndown=1: the kernel's two-determinant log density
    (particles [0, nup) up, [nup, n) down) equals FreeFermion.log_prob."""
    from fermiflow_tpu.ops.pallas_metropolis import metropolis_free_fermion

    occ_up = np.arange(2, dtype=np.int32)
    occ_dn = np.arange(1, dtype=np.int32)
    nx_up = tuple(int(v) for v in orb.nx[occ_up])
    ny_up = tuple(int(v) for v in orb.ny[occ_up])
    nx_dn = tuple(int(v) for v in orb.nx[occ_dn])
    ny_dn = tuple(int(v) for v in orb.ny[occ_dn])
    x0 = jax.random.normal(jax.random.PRNGKey(2), (64, 3, 2), dtype=jnp.float32)
    x, logp, acc = metropolis_free_fermion(
        x0, 7, 0.1, 0, nx_up, ny_up, interpret=True,
        nx_dn=nx_dn, ny_dn=ny_dn,
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-6)
    want = bd.log_prob(occ_up, occ_dn, x0)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(want), atol=1e-4)
