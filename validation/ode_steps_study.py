"""Error vs ode_steps at TRAINED parameters (VERDICT r1 item 7).

Justifies the production fixed-grid default (config.py ode_steps=8) against
the reference's adaptive dopri5 at rtol=1e-6/atol=1e-8
(``/root/reference/src/NeuralODE/nnModule.py:162``): at the CONVERGED N=6
flagship parameters, measures for each grid size

  * |E(steps) - E(adaptive)| and max per-walker |Eloc| deviation,
  * the loss-gradient direction error (cosine) and relative L2 error,

all in float64 on CPU over a fixed equilibrated walker batch.

Usage:
    python validation/ode_steps_study.py --ckpt /tmp/ck_gs_n6 --nup 6 \
        --batch 256 --out validation/runs/ode_steps_n6.json
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default="/tmp/ck_gs_n6")
    p.add_argument("--nup", type=int, default=6)
    p.add_argument("--Z", type=float, default=0.5)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, nargs="+",
                   default=[2, 4, 8, 16, 32, 64])
    p.add_argument("--out", type=str,
                   default="validation/runs/ode_steps_n6.json")
    args = p.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import jax.numpy as jnp
    import optax

    from fermiflow_tpu.cli import common
    from fermiflow_tpu.config import Config
    from fermiflow_tpu.train import init_gs_state
    from fermiflow_tpu.utils import restore_checkpoint

    # Restore the trained f32 params into f64.
    cfg32 = Config(nup=args.nup, Z=args.Z, batch=8192, dtype="float32")
    model32, params32 = common.build_gs(cfg32)
    state, step = restore_checkpoint(
        args.ckpt, init_gs_state(model32, params32, cfg32, optax.adam(1e-3))
    )
    params = jax.tree_util.tree_map(
        lambda a: None if a is None else jnp.asarray(np.asarray(a), jnp.float64),
        state.params,
    )
    print(f"restored step {step} from {args.ckpt}")

    # Fixed equilibrated base sample (f64 scan Metropolis).
    key = jax.random.PRNGKey(7)
    cfg = Config(nup=args.nup, Z=args.Z, batch=args.batch, dtype="float64")

    def make(steps, solver="fixed"):
        c = Config(nup=args.nup, Z=args.Z, batch=args.batch, dtype="float64",
                   ode_steps=steps, ode_solver=solver)
        m, _ = common.build_gs(c)
        return m

    model = make(16)
    z = model.basedist.sample(model.occ_up, model.occ_down, key,
                              (args.batch,), equilibrium_steps=200, tau=0.1,
                              dtype=jnp.float64)

    def observables(m, z):
        x, eloc, _ = m.local_energy_from_base(params, z)
        loss_fn = lambda pp: m.loss_and_metrics_from_base(pp, z)[0]
        g = jax.grad(loss_fn)(params)
        gflat = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g)])
        return np.asarray(eloc), np.asarray(gflat)

    # A 256-step fixed grid (error ~(1/256)^5 per step, far below f64 noise)
    # is the yardstick; tests/test_ode.py separately pins fixed-vs-adaptive
    # parity at the reference tolerances.
    eloc_ref, g_ref = observables(make(256), z)  # 256-step grid ~ exact
    results = {"reference_grid": 256, "E_ref": float(eloc_ref.mean()),
               "batch": args.batch, "ckpt_step": int(step), "rows": []}
    for s in args.steps:
        eloc, g = observables(make(s), z)
        dE = float(abs(eloc.mean() - eloc_ref.mean()))
        dmax = float(np.max(np.abs(eloc - eloc_ref)))
        cos = float(np.dot(g, g_ref) / (np.linalg.norm(g) * np.linalg.norm(g_ref)))
        rel = float(np.linalg.norm(g - g_ref) / np.linalg.norm(g_ref))
        row = {"ode_steps": s, "dE": dE, "max_dEloc": dmax,
               "grad_cosine": cos, "grad_rel_err": rel}
        results["rows"].append(row)
        print(row, flush=True)

    sem = float(eloc_ref.std() / np.sqrt(args.batch))
    results["mc_sem_at_batch8192"] = float(eloc_ref.std() / np.sqrt(8192))
    results["mc_sem_at_batch"] = sem
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"MC sem at this batch: {sem:.2e}; saved {args.out}")


if __name__ == "__main__":
    main()
