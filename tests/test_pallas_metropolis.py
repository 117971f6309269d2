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


def test_choose_block_awkward_batches():
    """Awkward batch sizes pad up to a legal Mosaic grid instead of silently
    launching one giant full-array block (round-3 VERDICT weak spot #8)."""
    from fermiflow_tpu.ops.pallas_metropolis import _choose_block

    # Friendly sizes: unchanged, no padding.
    assert _choose_block(8192) == (2048, 8192)
    assert _choose_block(1024) == (1024, 1024)
    assert _choose_block(8192, cap=1024) == (1024, 8192)
    # Small batches: one full-array block, rounded up to the sublane count.
    assert _choose_block(132) == (136, 136)
    assert _choose_block(2) == (8, 8)
    # Large with no 1024-multiple divisor: pad to the next 1024 multiple.
    bw, bp = _choose_block(8200)
    assert bp == 9216 and bp % bw == 0 and bw % 1024 == 0 and bw <= 2048
    bw, bp = _choose_block(2056, cap=1024)
    assert bp == 3072 and bw == 1024


def test_awkward_batch_logp_padding_interpret():
    """B=132 (not a multiple of 8) and B=2056 (no block divisor) run through
    the padding path; outputs slice back to B and logp stays exact."""
    from fermiflow_tpu.ops.pallas_metropolis import metropolis_free_fermion

    occ, nx_occ, ny_occ = _occ_tuples(3)
    for B in (132, 2056):
        x0 = jax.random.normal(
            jax.random.PRNGKey(B), (B, 3, 2), dtype=jnp.float32
        )
        x, logp, acc = metropolis_free_fermion(
            x0, 7, 0.1, 0, nx_occ, ny_occ, interpret=True
        )
        assert x.shape == (B, 3, 2) and logp.shape == (B,)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-6)
        want = bd.log_prob(occ, (), x0)
        # atol 1e-3: one in ~2e3 walkers hits a worse-conditioned f32
        # determinant than the small-batch interpret tests see.
        np.testing.assert_allclose(np.asarray(logp), np.asarray(want),
                                   atol=1e-3)


def test_awkward_batch_multistate_padding_interpret():
    from fermiflow_tpu.ops.pallas_metropolis import (
        metropolis_free_fermion_multistate,
    )

    occ_table, _ = orb.fermion_states(3, 0, 2.0)
    B = 132
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    idx = jax.random.randint(k1, (B,), 0, occ_table.shape[0])
    x0 = jax.random.normal(k2, (B, 3, 2), dtype=jnp.float32)
    occ = jnp.take(jnp.asarray(occ_table), idx, axis=0)
    nx = jnp.take(jnp.asarray(orb.nx), occ)
    ny = jnp.take(jnp.asarray(orb.ny), occ)
    x, logp, acc = metropolis_free_fermion_multistate(
        x0, 7, 0.1, 0, nx, ny, interpret=True
    )
    assert logp.shape == (B,)
    want = bd.log_prob_multstates(jnp.asarray(occ_table), idx, x0)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(want), atol=1e-3)


@needs_tpu
def test_awkward_batch_chain_tpu():
    from fermiflow_tpu.ops.pallas_metropolis import metropolis_free_fermion

    occ, nx_occ, ny_occ = _occ_tuples(6)
    B = 8200
    x0 = jax.random.normal(jax.random.PRNGKey(3), (B, 6, 2),
                           dtype=jnp.float32)
    x, logp, acc = metropolis_free_fermion(x0, 7, 0.1, 50, nx_occ, ny_occ)
    assert x.shape == (B, 6, 2)
    assert 0.5 < float(acc.mean()) < 0.95
    want = bd.log_prob(occ, (), x)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(want), atol=1e-3)


def test_multichain_kernel_snapshots_and_tau_interpret():
    """steps=0 chains, 3 segments: snapshots replicate the initial state,
    logp is exact, and the in-kernel tau adaptation applies the production
    rule tau *= exp(gain*(0 - target)) once per segment — deterministic, so
    exactly checkable in the interpreter."""
    from fermiflow_tpu.ops.pallas_metropolis import (
        metropolis_free_fermion_chains,
    )

    occ, nx_occ, ny_occ = _occ_tuples(3)
    B, S = 64, 3
    target, gain = 0.5, 0.1
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, 3, 2),
                           dtype=jnp.float32)
    tau0 = jnp.linspace(0.05, 0.2, B).astype(jnp.float32)
    xs, logps, rates, tau_out = metropolis_free_fermion_chains(
        x0, 7, tau0, 0, S, nx_occ, ny_occ, interpret=True,
        target=target, gain=gain,
    )
    assert xs.shape == (S, B, 3, 2)
    want = np.asarray(bd.log_prob(occ, (), x0))
    for s in range(S):
        np.testing.assert_allclose(np.asarray(xs[s]), np.asarray(x0),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(logps[s]), want, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(rates[s]), 0.0)
    # S applications of the adaptation rule at rate 0.
    want_tau = np.asarray(tau0) * np.exp(gain * (0.0 - target)) ** S
    np.testing.assert_allclose(np.asarray(tau_out), want_tau, rtol=1e-5)


def test_multichain_kernel_reinit_keeps_tau_interpret():
    from fermiflow_tpu.ops.pallas_metropolis import (
        metropolis_free_fermion_chains,
    )

    occ, nx_occ, ny_occ = _occ_tuples(3)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (32, 3, 2),
                           dtype=jnp.float32)
    xs, logps, rates, tau_out = metropolis_free_fermion_chains(
        x0, 7, 0.1, 0, 2, nx_occ, ny_occ, interpret=True, reinit=True,
    )
    # Compatibility mode: fixed tau, and segment 0 still starts from x0.
    np.testing.assert_allclose(np.asarray(tau_out), 0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(xs[0]), np.asarray(x0), atol=1e-6)


@needs_tpu
def test_multichain_kernel_chain_tpu():
    """Real chains: per-segment acceptance sane, final logp consistent, and
    the persistent multi-chain run drives tau toward the target acceptance."""
    from fermiflow_tpu.ops.pallas_metropolis import (
        metropolis_free_fermion_chains,
    )

    occ, nx_occ, ny_occ = _occ_tuples(6)
    B, S = 4096, 10
    x0 = jax.random.normal(jax.random.PRNGKey(2), (B, 6, 2),
                           dtype=jnp.float32)
    xs, logps, rates, tau_out = metropolis_free_fermion_chains(
        x0, 7, 0.1, 30, S, nx_occ, ny_occ,
    )
    assert xs.shape == (S, B, 6, 2)
    r = np.asarray(rates).mean(axis=1)
    assert 0.4 < r.min() and r.max() < 0.95, r
    want = bd.log_prob(occ, (), xs[-1])
    np.testing.assert_allclose(np.asarray(logps[-1]), np.asarray(want),
                               atol=1e-3)
    # tau rose from 0.1 toward the 0.5-acceptance point (accept ~0.75 at
    # tau=0.1 for N=6).
    assert float(np.asarray(tau_out).mean()) > 0.1
