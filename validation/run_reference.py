"""Run the actual reference (buwantaiji/FermiFlow) on this host's CPU.

The reference CLI (``/root/reference/src/FermionHO2D.py:34``) hardcodes CUDA
and its solver module imports torchdiffeq at module scope
(``src/NeuralODE/nnModule.py:6``), which is not installed here.  This driver
imports the reference *as a library*, stubs torchdiffeq, forces the scipy
solver backend (``src/NeuralODE/nnModule.py:49-61`` — its only runnable
backend on this host), and trains GSVMC on CPU float64 with the reference's
own Adam/loss loop, logging E/E_std per iteration to jsonl.

This exists to produce the trained-energy parity anchor demanded by
BASELINE.json ("match reference VMC energies within 1 sigma MC error"):
the identical config is then trained with fermiflow_tpu and the two final
energies are compared in docs/VALIDATION.md.

Usage:
    python validation/run_reference.py --nup 3 --Z 0.5 --batch 512 \
        --iternum 300 --out /tmp/ref_n3.jsonl
"""

import argparse
import json
import sys
import time
import types

# Stub torchdiffeq before the reference imports it; the scipy path never
# touches it.
_fake = types.ModuleType("torchdiffeq")


def _no_odeint(*a, **k):
    raise RuntimeError("torchdiffeq is unavailable; scipy backend only")


_fake.odeint = _no_odeint
sys.modules["torchdiffeq"] = _fake
sys.path.insert(0, "/root/reference/src")

import torch  # noqa: E402

torch.set_default_dtype(torch.float64)

import NeuralODE.nnModule as nnm  # noqa: E402

_orig_solve = nnm.solve_ivp_nnmodule


def _scipy_solve(f, t_span, x0s, params_require_grad=True,
                 implementation="scipy", rtol=1e-6, atol=1e-8):
    return _orig_solve(f, t_span, x0s, params_require_grad, "scipy",
                       rtol, atol)


# Patch every module-level binding of the solver so both the CNF forward
# calls and the adjoint's internal backward call go through scipy.
nnm.solve_ivp_nnmodule = _scipy_solve

import flow  # noqa: E402

flow.solve_ivp_nnmodule = _scipy_solve

from base_dist import FreeFermion  # noqa: E402
from equivariant_funs import Backflow  # noqa: E402
from MLP import MLP  # noqa: E402
from orbitals import HO2D  # noqa: E402
from potentials import HO, CoulombPairPotential  # noqa: E402
from VMC import GSVMC  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nup", type=int, default=3)
    p.add_argument("--ndown", type=int, default=0)
    p.add_argument("--Z", type=float, default=0.5)
    p.add_argument("--Deta", type=int, default=50)
    p.add_argument("--Dmu", type=int, default=50)
    p.add_argument("--t0", type=float, default=0.0)
    p.add_argument("--t1", type=float, default=1.0)
    p.add_argument("--iternum", type=int, default=300)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()

    torch.manual_seed(args.seed)
    device = torch.device("cpu")

    orbitals = HO2D()
    basedist = FreeFermion(device=device)
    eta = MLP(1, args.Deta)
    eta.init_zeros()
    mu = MLP(1, args.Dmu)
    mu.init_zeros()
    v = Backflow(eta, mu=mu)
    cnf = flow.CNF(v, (args.t0, args.t1))
    model = GSVMC(args.nup, args.ndown, orbitals, basedist, cnf,
                  CoulombPairPotential(args.Z), sp_potential=HO())
    model.to(device=device)
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
