"""Walker-sharded scaling measurement.

BASELINE.json's north star includes ">=80% walker-steps/s scaling efficiency"
across devices.  Real multi-chip hardware is not attached to this session, so
this script measures WEAK SCALING of the sharded train step over however many
devices are visible (on a TPU pod slice it measures the real thing; on CPU it
exercises the identical GSPMD program over virtual devices with
XLA_FLAGS=--xla_force_host_platform_device_count=N, which validates the
sharding/collective structure but not ICI bandwidth).

Prints one JSON line: per-device-count walker-throughput of the full VMC
train step and the efficiency relative to 1 device.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fermiflow_tpu.cli import common
from fermiflow_tpu.config import Config
from fermiflow_tpu.parallel import make_walker_mesh, shard_walkers
from fermiflow_tpu.train import (
    init_beta_state,
    init_gs_state,
    make_beta_train_step,
    make_gs_train_step,
)

BATCH_PER_DEVICE = 1024
REPS = 5


def measure(devices, cfg_kwargs, finite_t=False):
    ndev = len(devices)
    cfg = Config(
        nup=6,
        Z=0.5,
        batch=BATCH_PER_DEVICE * ndev,
        ode_steps=4,
        equilibrium_steps=30,
        persistent_walkers=True,
        mcmc_steps=30,
        lr=1e-3,
        **cfg_kwargs,
    )
    optimizer = optax.adam(cfg.lr)
    mesh = make_walker_mesh(devices)
    if finite_t:
        cfg.beta, cfg.deltaE, cfg.boltzmann = 2.0, 2.0, True
        model, params = common.build_beta(cfg)
        state = init_beta_state(model, params, cfg, optimizer)
    else:
        model, params = common.build_gs(cfg)
        state = init_gs_state(model, params, cfg, optimizer)
    state = state._replace(
        walkers=shard_walkers(mesh, state.walkers),
        tau=shard_walkers(mesh, state.tau),
    )
    if finite_t:
        raw = make_beta_train_step(model, optimizer, cfg, mesh=mesh, jit=False)
    else:
        raw = make_gs_train_step(model, optimizer, cfg, mesh=mesh, jit=False)

    @jax.jit
    def multi(state):
        def body(s, _):
            s2, m = raw(s)
            return s2, m["E"]

        return jax.lax.scan(body, state, None, length=REPS)

    state, Es = multi(state)
    np.asarray(Es)  # compile+warmup
    t0 = time.perf_counter()
    state, Es = multi(state)
    np.asarray(Es)
    dt = (time.perf_counter() - t0) / REPS
    walker_steps = cfg.batch * cfg.mcmc_steps
    return walker_steps / dt, float(Es[-1])


def main():
    tpus = [d for d in jax.devices() if d.platform == "tpu"]
    # A single chip has no scaling story — fall back to the virtual CPU mesh
    # (set XLA_FLAGS=--xla_force_host_platform_device_count=N).
    use_tpu = len(tpus) > 1
    if not use_tpu:
        jax.config.update("jax_enable_x64", True)
    devices = tpus if use_tpu else jax.devices("cpu")
    dtype = "float32" if use_tpu else "float64"
    counts = sorted({1, 2, len(devices) // 2, len(devices)} - {0})
    results = {}
    base = None
    for ndev in counts:
        if ndev > len(devices):
            continue
        wps, E = measure(devices[:ndev], {"dtype": dtype})
        if base is None:
            base = wps
        results[str(ndev)] = {
            "walker_steps_per_s": round(wps, 1),
            "efficiency": round(wps / (base * ndev), 3),
            "E": round(E, 4),
        }
    # Finite-T row (SURVEY §2.4(d-f)): the sharded BetaVMC step — Categorical
    # draw + coupled refresh + segment baselines over the mesh — at 1 device
    # and the full mesh.
    beta_results = {}
    bbase = None
    for ndev in (1, len(devices)):
        wps, E = measure(devices[:ndev], {"dtype": dtype}, finite_t=True)
        if bbase is None:
            bbase = wps
        beta_results[str(ndev)] = {
            "walker_steps_per_s": round(wps, 1),
            "efficiency": round(wps / (bbase * ndev), 3),
            "E": round(E, 4),
        }
    print(
        json.dumps(
            {
                "metric": "train_step_walker_throughput_scaling",
                "batch_per_device": BATCH_PER_DEVICE,
                "platform": devices[0].platform,
                "results": results,
                "beta_results": beta_results,
            }
        )
    )


if __name__ == "__main__":
    main()
