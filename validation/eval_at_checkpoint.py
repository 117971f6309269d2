"""Independent energy evaluation at a trained checkpoint.

Loads a GS checkpoint, re-equilibrates FRESH chains (Gaussian init, long
fixed-tau burn-in — no persistent-chain state), and estimates E with the
XLA nested-jvp local-energy engine — a path independent of BOTH fused
kernels and of the training-time estimator, so it cross-checks (a) the
persistent sampler's stationarity and (b) the Hessian-flow/Pallas Eloc,
against the same converged wavefunction.

    python validation/eval_at_checkpoint.py --ckpt /root/ckpts/gs_n6_z40 \
        --nup 6 --Z 4.0 --batch 8192 --equil 600 --reps 8 \
        --out validation/runs/eval_z40_fresh.json
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

from fermiflow_tpu.cli import common
from fermiflow_tpu.config import Config
from fermiflow_tpu.train import init_gs_state
from fermiflow_tpu.utils import restore_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--nup", type=int, default=6)
    p.add_argument("--ndown", type=int, default=0)
    p.add_argument("--Z", type=float, required=True)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--train-batch", type=int, default=8192)
    p.add_argument("--equil", type=int, default=600)
    p.add_argument("--reps", type=int, default=8,
                   help="independent fresh-chain rounds to pool")
    p.add_argument("--dtype", type=str, default="float32")
    p.add_argument("--engine", type=str, default="hessian_flow",
                   choices=["hessian_flow", "nested_jvp"])
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()

    cfg = Config(nup=args.nup, ndown=args.ndown, Z=args.Z,
                 batch=args.train_batch, dtype=args.dtype,
                 laplacian_chunk=256)
    common.setup_precision(cfg)
    model, params0 = common.build_gs(cfg)
    state = init_gs_state(model, params0, cfg, optax.adam(1e-3))
    state, step = restore_checkpoint(args.ckpt, state)
    print(f"restored step {step}", flush=True)
    params = state.params
    dtype = cfg.jnp_dtype()

    @jax.jit
    def one_round(key):
        k1, k2 = jax.random.split(key)
        z0 = jax.random.normal(
            k1, (args.batch, model.n, model.basedist.dim), dtype=dtype)
        from fermiflow_tpu import mcmc
        ms = mcmc.metropolis(
            lambda zz: model.basedist.log_prob(
                model.occ_up, model.occ_down, zz),
            k2, z0, args.equil, 0.1,
        )
        if args.engine == "hessian_flow":
            x, eloc, _ = model.local_energy_from_base(params, ms.x)
        else:
            x = model.cnf.generate(params, ms.x)
            eloc, _ = model.local_energy(params, x)
        return eloc, ms.accept_rate

    elocs = []
    for r in range(args.reps):
        eloc, acc = one_round(jax.random.PRNGKey(1000 + r))
        elocs.append(np.asarray(eloc, dtype=np.float64))
        print(f"round {r}: E={elocs[-1].mean():.5f} "
              f"acc={float(np.asarray(acc).mean()):.3f}", flush=True)
    el = np.concatenate(elocs)
    res = {
        "ckpt": args.ckpt, "step": int(step), "nup": args.nup, "Z": args.Z,
        "engine": args.engine, "batch": args.batch, "equil": args.equil,
        "reps": args.reps, "n_total": int(el.size),
        "E": float(el.mean()), "E_std": float(el.std()),
        "E_sem": float(el.std() / np.sqrt(el.size)),
    }
    print(json.dumps(res))
    with open(args.out, "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
