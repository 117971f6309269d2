"""Multi-device sharding tests on the 8-virtual-CPU mesh — the JAX-native
substitute for distributed test machinery (SURVEY.md §4 note (c))."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fermiflow_tpu.cli import common
from fermiflow_tpu.config import Config
from fermiflow_tpu.parallel import (
    make_walker_mesh,
    replicated_sharding,
    shard_walkers,
    walker_sharding,
)
from fermiflow_tpu.train import init_gs_state, make_gs_train_step

cpus = jax.devices("cpu")
needs_8 = pytest.mark.skipif(len(cpus) < 8, reason="needs 8 virtual devices")


@needs_8
def test_mesh_and_shardings():
    mesh = make_walker_mesh(cpus)
    assert mesh.shape == {"walkers": 8}
    x = jnp.zeros((64, 3, 2))
    xs = shard_walkers(mesh, x)
    assert len(xs.sharding.device_set) == 8
    assert walker_sharding(mesh).spec == jax.sharding.PartitionSpec("walkers")
    assert replicated_sharding(mesh).spec == jax.sharding.PartitionSpec()


@needs_8
def test_sharded_train_step_matches_single_device():
    """The same seeded train step, sharded over 8 devices vs unsharded, must
    produce identical physics (up to reduction reordering)."""
    cfg = Config(
        nup=3, Z=0.5, batch=64, d_eta=8, d_mu=8, ode_steps=4,
        equilibrium_steps=8, seed=3,
    )
    model, params = common.build_gs(cfg)
    opt = optax.adam(cfg.lr)

    state1 = init_gs_state(model, params, cfg, opt)
    step1 = make_gs_train_step(model, opt, cfg)
    state1, m1 = step1(state1)

    mesh = make_walker_mesh(cpus)
    # Fresh params: step1 donated its input state (which shared buffers with
    # `params`).  Zero init is deterministic, so the runs stay comparable.
    _, params2 = common.build_gs(cfg)
    state2 = init_gs_state(model, params2, cfg, opt)
    state2 = state2._replace(
        walkers=shard_walkers(mesh, state2.walkers),
        tau=shard_walkers(mesh, state2.tau),
    )
    step2 = make_gs_train_step(model, opt, cfg, mesh=mesh)
    state2, m2 = step2(state2)

    np.testing.assert_allclose(float(m1["E"]), float(m2["E"]), rtol=1e-10)
    np.testing.assert_allclose(float(m1["E_std"]), float(m2["E_std"]), rtol=1e-9)
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


@needs_8
def test_sharded_step_keeps_walkers_sharded():
    cfg = Config(
        nup=3, Z=0.0, batch=32, d_eta=8, d_mu=8, ode_steps=2,
        equilibrium_steps=4, persistent_walkers=True, mcmc_steps=4,
    )
    model, params = common.build_gs(cfg)
    opt = optax.adam(cfg.lr)
    mesh = make_walker_mesh(cpus)
    state = init_gs_state(model, params, cfg, opt)
    state = state._replace(
        walkers=shard_walkers(mesh, state.walkers),
        tau=shard_walkers(mesh, state.tau),
    )
    step = make_gs_train_step(model, opt, cfg, mesh=mesh)
    state, _ = step(state)
    assert len(state.walkers.sharding.device_set) == 8


@needs_8
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    with jax.default_device(cpus[0]):
        loss, E = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(E))
