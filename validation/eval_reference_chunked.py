"""Cross-framework parity, chunked: the REFERENCE's estimator at our params.

Same computation as ``eval_reference_at_params.py`` — the reference's own
Metropolis sampler, reverse-ODE log-density, and ``y_grad_laplacian`` local
energy (``/root/reference/src/VMC.py:40-59``) at parameters trained by
fermiflow_tpu — but the batch is evaluated in independent chunks instead of
one monolithic scipy solve.

Why: the reference integrates the whole batch as ONE coupled ODE system with
a single shared adaptive step (``/root/reference/src/NeuralODE/nnModule.py:
50-63``).  At batch >= 128 the doubly-augmented laplacian adjoint solves
stall for >10 h on this host: one stiff walker collapses the shared step size
for the entire batch.  Walkers are statistically independent, so evaluating
``total`` walkers in chunks of ``chunk`` is the *identical* estimator (same
sampler, same local-energy code), with per-chunk progress, robustness to
stiff outliers, and any-time-valid partial statistics.

Each chunk appends one jsonl record with its Eloc values; the final record
carries the pooled E / E_std / E_sem.

Usage:
    python validation/eval_reference_chunked.py \
        --params validation/runs/params_n3.npz --nup 3 --Z 0.5 \
        --chunk 16 --total 256 --out validation/runs/ref_eval_n3_chunked.jsonl
"""

import argparse
import json
import time

import numpy as np

import _refenv  # noqa: F401
import torch


def chunk_eloc(model, chunk):
    """One chunk of the reference's GSVMC.forward minus the REINFORCE term
    (``/root/reference/src/VMC.py:40-59``): sample, then local energy via
    the reference's y_grad_laplacian.  Returns Eloc as a numpy array."""
    from utils import y_grad_laplacian

    _, x = model.sample((chunk,))
    x = x.detach().requires_grad_(True)
    logp, grad_logp, laplacian_logp = y_grad_laplacian(model.logp, x)
    kinetic = -0.25 * laplacian_logp - 0.125 * (grad_logp ** 2).sum(dim=(-2, -1))
    potential = model.pair_potential.V(x)
    if model.sp_potential:
        potential += model.sp_potential.V(x)
    return (kinetic + potential).detach().numpy()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--params", type=str, default=None,
                   help=".npz with eta_w1/eta_b1/eta_w2[/mu_*] (float64); "
                        "omit for identity (zero) init")
    p.add_argument("--nup", type=int, default=3)
    p.add_argument("--ndown", type=int, default=0)
    p.add_argument("--Z", type=float, default=0.5)
    p.add_argument("--Deta", type=int, default=50)
    p.add_argument("--Dmu", type=int, default=50)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--total", type=int, default=256)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()

    torch.manual_seed(args.seed)
    model = _refenv.build_gs_model(args.nup, args.ndown, args.Z,
                                   args.Deta, args.Dmu)
    if args.params:
        d = np.load(args.params)
        eta = {k: d[f"eta_{k}"] for k in ("w1", "b1", "w2")}
        mu = ({k: d[f"mu_{k}"] for k in ("w1", "b1", "w2")}
              if "mu_w1" in d.files else None)
        _refenv.load_backflow_params_into(model, eta, mu)

    nchunks = (args.total + args.chunk - 1) // args.chunk
    all_eloc = []
    with open(args.out, "w") as fh:
        fh.write(json.dumps({"config": vars(args)}) + "\n")
        fh.flush()
        for c in range(nchunks):
            start = time.time()
            eloc = chunk_eloc(model, args.chunk)
            dt = time.time() - start
            all_eloc.append(eloc)
            pooled = np.concatenate(all_eloc)
            rec = {"chunk": c, "seconds": round(dt, 1),
                   "eloc": [round(float(e), 8) for e in eloc],
                   "E_pooled": float(pooled.mean()),
                   "E_std_pooled": float(pooled.std(ddof=1)),
                   "E_sem_pooled": float(pooled.std(ddof=1)
                                         / np.sqrt(pooled.size)),
                   "n_pooled": int(pooled.size)}
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(f"chunk {c + 1}/{nchunks}: E_pooled={rec['E_pooled']:.6f} "
                  f"+- {rec['E_sem_pooled']:.6f} (n={rec['n_pooled']}, "
                  f"{dt:.1f}s)", flush=True)
        pooled = np.concatenate(all_eloc)
        final = {
            "framework": ("reference (buwantaiji/FermiFlow, scipy backend, "
                          "CPU f64, chunked batch)"),
            "params": args.params or "identity (zero init)",
            "nup": args.nup, "Z": args.Z,
            "chunk": args.chunk, "total": int(pooled.size),
            "E": float(pooled.mean()),
            "E_std": float(pooled.std(ddof=1)),
            "E_sem": float(pooled.std(ddof=1) / np.sqrt(pooled.size)),
        }
        fh.write(json.dumps(final) + "\n")
    print(json.dumps(final))


if __name__ == "__main__":
    main()
