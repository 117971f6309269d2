"""Cross-framework wavefunction parity: run the REFERENCE's estimator on
parameters trained by fermiflow_tpu.

The two frameworks implement the mathematically identical variational family
(sigmoid MLPs eta/mu -> backflow velocity -> CNF over the Slater base state),
so a trained fermiflow_tpu parameter set can be loaded into the reference's
torch modules and evaluated with the reference's own Metropolis sampler,
reverse-ODE log-density, and y_grad_laplacian local energy
(``/root/reference/src/VMC.py:40-59``).  Agreement of E within MC error is
direct evidence that the trained wavefunction — not just its energy estimate —
is the same object in both frameworks.

Usage:
    python validation/eval_reference_at_params.py \
        --params validation/runs/params_n3.npz --nup 3 --Z 0.5 --batch 256 \
        --out validation/runs/ref_eval_n3.json
"""

import argparse
import json
import time

import numpy as np

import _refenv  # noqa: F401
import torch


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
    p.add_argument("--batch", type=int, default=256)
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

    start = time.time()
    model(args.batch)  # reference forward: sample + logp + y_grad_laplacian
    dt = time.time() - start
    rec = {
        "framework": "reference (buwantaiji/FermiFlow, scipy backend, CPU f64)",
        "params": args.params or "identity (zero init)",
        "nup": args.nup, "Z": args.Z, "batch": args.batch,
        "E": model.E, "E_std": model.E_std,
        "E_sem": model.E_std / np.sqrt(args.batch),
        "seconds": round(dt, 1),
    }
    with open(args.out, "w") as fh:
        fh.write(json.dumps(rec, indent=1) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
