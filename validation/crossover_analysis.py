"""Fermi-liquid -> Wigner-molecule crossover diagnostics at trained params.

The reference's headline physics claim (``/root/reference/README.md:22-40``,
paper JML 1(1):38-59) is the coupling-driven crossover of the N=6 2D quantum
dot.  The repo itself ships no analysis code; this script produces the
standard structural diagnostics from a converged fermiflow_tpu checkpoint:

- radial one-body density n(r) (shell structure -> ring localization),
- pair-distance distribution g(r) (short-range hole deepens with Z),
- <r^2>, <V_int>, <V_trap> and the virial decomposition.

Samples are drawn exactly (base Metropolis z ~ |det|^2, then x = flow(z) --
the same transport the estimator uses), so the histograms are unbiased
samples of |Psi|^2.

Usage:
    python validation/crossover_analysis.py --ckpt /tmp/ck_gs_n6_z40 \
        --nup 6 --Z 4.0 --walkers 32768 --out validation/runs/xover_z40.json
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
    p.add_argument("--walkers", type=int, default=32768)
    p.add_argument("--train-batch", type=int, default=8192,
                   help="batch the checkpoint was trained with (walker-buffer "
                        "shape must match to restore)")
    p.add_argument("--equil", type=int, default=600)
    p.add_argument("--dtype", type=str, default="float32")
    p.add_argument("--rmax", type=float, default=6.0)
    p.add_argument("--bins", type=int, default=120)
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()

    cfg = Config(nup=args.nup, ndown=args.ndown, Z=args.Z,
                 batch=args.train_batch, dtype=args.dtype)
    common.setup_precision(cfg)
    model, params0 = common.build_gs(cfg)
    state = init_gs_state(model, params0, cfg, optax.adam(1e-3))
    state, step = restore_checkpoint(args.ckpt, state)
    if step == 0:
        raise SystemExit(f"no checkpoint found in {args.ckpt}")
    params = state.params

    key = jax.random.fold_in(jax.random.PRNGKey(7), 77)
    dtype = cfg.jnp_dtype()

    @jax.jit
    def draw(key):
        z = model.basedist.sample(
            model.occ_up, model.occ_down, key, (args.walkers,),
            equilibrium_steps=args.equil, tau=cfg.tau, dtype=dtype,
        )
        x = model.cnf.generate(params, z)
        r = jnp.linalg.norm(x, axis=-1)                      # (B, n)
        diff = x[:, :, None, :] - x[:, None, :, :]
        dij = jnp.linalg.norm(diff + jnp.eye(model.n, dtype=dtype)[..., None],
                              axis=-1)
        iu = jnp.triu_indices(model.n, k=1)
        pair = dij[:, iu[0], iu[1]]                          # (B, npairs)
        v_int = cfg.Z * jnp.sum(1.0 / pair, axis=-1)
        v_trap = 0.5 * jnp.sum(x**2, axis=(-2, -1))
        return r, pair, v_int, v_trap

    r, pair, v_int, v_trap = jax.tree.map(np.asarray, draw(key))

    edges = np.linspace(0.0, args.rmax, args.bins + 1)
    # n(r): normalized so that integral 2*pi*r*n(r) dr = n particles.
    hist_r, _ = np.histogram(r.ravel(), bins=edges)
    centers = 0.5 * (edges[1:] + edges[:-1])
    area = 2 * np.pi * centers * np.diff(edges)
    n_of_r = hist_r / (area * r.shape[0])
    hist_pair, _ = np.histogram(pair.ravel(), bins=edges)
    g_of_r = hist_pair / (area * pair.shape[0])

    B = r.shape[0]
    rec = {
        "Z": args.Z, "nup": args.nup, "walkers": B, "ckpt_step": int(step),
        "mean_r": float(r.mean()), "rms_r": float(np.sqrt((r**2).mean())),
        "mean_pair_distance": float(pair.mean()),
        "V_int": float(v_int.mean()),
        "V_int_sem": float(v_int.std() / np.sqrt(B)),
        "V_trap": float(v_trap.mean()),
        "V_trap_sem": float(v_trap.std() / np.sqrt(B)),
        "r_edges": edges.tolist(),
        "n_of_r": n_of_r.tolist(),
        "g_of_r": g_of_r.tolist(),
    }
    with open(args.out, "w") as fh:
        fh.write(json.dumps(rec) + "\n")
    peak = centers[int(np.argmax(n_of_r))]
    print(json.dumps({k: rec[k] for k in
                      ("Z", "rms_r", "mean_pair_distance", "V_int", "V_trap")}
                     | {"n_of_r_peak_r": float(peak)}))


if __name__ == "__main__":
    main()
