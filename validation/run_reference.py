"""Train the actual reference (buwantaiji/FermiFlow) on this host's CPU.

The reference CLI (``/root/reference/src/FermionHO2D.py:34``) hardcodes CUDA
and torchdiffeq; ``_refenv`` imports it as a library on the CPU/scipy backend.
This driver runs the reference's own Adam/loss loop and logs E/E_std per
iteration to jsonl, producing one side of the trained-energy parity study in
docs/VALIDATION.md (the other side is fermiflow_tpu at the identical config).

Measured cost on this 2-core host: ~45-60 min/iteration at batch=128 (the
y_grad_laplacian loop re-solves the adjoint ODE 2*n*dim+1 times through
scipy); batch=32 runs at ~5-7 min/iteration, which bounds what is honestly
trainable here.

Usage:
    python validation/run_reference.py --nup 3 --Z 0.5 --batch 32 \
        --iternum 60 --out validation/runs/ref_n3_z05_b32.jsonl
"""

import argparse
import json
import time

import _refenv  # noqa: F401  (stubs torchdiffeq, patches in the scipy solver)
import torch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nup", type=int, default=3)
    p.add_argument("--ndown", type=int, default=0)
    p.add_argument("--Z", type=float, default=0.5)
    p.add_argument("--Deta", type=int, default=50)
    p.add_argument("--Dmu", type=int, default=50)
    p.add_argument("--t0", type=float, default=0.0)
    p.add_argument("--t1", type=float, default=1.0)
    p.add_argument("--iternum", type=int, default=60)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()

    torch.manual_seed(args.seed)
    model = _refenv.build_gs_model(args.nup, args.ndown, args.Z,
                                   args.Deta, args.Dmu, args.t0, args.t1)
    optimizer = torch.optim.Adam(model.parameters(), lr=args.lr)

    print(f"REFERENCE run: nup={args.nup} Z={args.Z} batch={args.batch} "
          f"iternum={args.iternum} lr={args.lr} (scipy backend, CPU f64)",
          flush=True)

    with open(args.out, "w") as fh:
        fh.write(json.dumps({"config": vars(args)}) + "\n")
        for i in range(1, args.iternum + 1):
            start = time.time()
            gradE = model(args.batch)
            optimizer.zero_grad()
            gradE.backward()
            optimizer.step()
            dt = time.time() - start
            rec = {"iter": i, "E": model.E, "E_std": model.E_std,
                   "seconds": round(dt, 3)}
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(f"\niter: {i:03d} E: {model.E:.6f} E_std: {model.E_std:.6f} "
                  f"({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
