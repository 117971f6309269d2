"""Train the actual reference finite-T driver (BetaVMC) on this host's CPU.

Runs the reference's own finite-temperature Adam/two-loss loop
(``/root/reference/src/BetaFermionHO2D.py:72-79``) via the ``_refenv``
CPU/scipy import (torchdiffeq stubbed, NaN-safe pair-divergence patch), and
logs F/F_std/E/E_std/S/S_analytical per iteration to jsonl.  This produces
the reference side of the finite-T trained parity study (the other side is
``fermiflow_tpu.cli.finite_t`` at the identical physics config) — the one
parity asymmetry VERDICT r4 flagged.

This is a 2-core host: the runner pins torch to ONE thread so a concurrent
TPU job is not starved (CLAUDE.md r4 lesson).

Usage:
    nice -n 19 python -u validation/run_reference_beta.py --nup 3 \
        --beta 2.0 --deltaE 2.0 --Z 0.5 --boltzmann --batch 32 \
        --iternum 2500 --out validation/runs/ref_beta_n3_z05_b32.jsonl
"""

import argparse
import json
import time

import _refenv  # noqa: F401  (stubs torchdiffeq, patches in the scipy solver)
import torch

torch.set_num_threads(1)


def build_beta_model(beta, nup, ndown, Z, deltaE, boltzmann,
                     Deta=50, Dmu=50, t0=0.0, t1=1.0):
    """Reference BetaVMC on CPU, identity-initialized flow
    (mirrors ``src/BetaFermionHO2D.py:39-60``)."""
    import flow
    from base_dist import FreeFermion
    from equivariant_funs import Backflow
    from MLP import MLP
    from orbitals import HO2D
    from potentials import HO, CoulombPairPotential
    from VMC import BetaVMC

    device = torch.device("cpu")
    orbitals = HO2D()
    basedist = FreeFermion(device=device)
    eta = MLP(1, Deta)
    eta.init_zeros()
    mu = MLP(1, Dmu)
    mu.init_zeros()
    v = Backflow(eta, mu=mu)
    cnf = flow.CNF(v, (t0, t1))
    model = BetaVMC(beta, nup, ndown, deltaE, boltzmann,
                    orbitals, basedist, cnf,
                    CoulombPairPotential(Z), sp_potential=HO())
    model.to(device=device)
    return model


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--beta", type=float, default=2.0)
    p.add_argument("--nup", type=int, default=3)
    p.add_argument("--ndown", type=int, default=0)
    p.add_argument("--Z", type=float, default=0.5)
    p.add_argument("--deltaE", type=float, default=2.0)
    p.add_argument("--boltzmann", action="store_true")
    p.add_argument("--Deta", type=int, default=50)
    p.add_argument("--Dmu", type=int, default=50)
    p.add_argument("--iternum", type=int, default=2500)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()

    torch.manual_seed(args.seed)
    model = build_beta_model(args.beta, args.nup, args.ndown, args.Z,
                             args.deltaE, args.boltzmann,
                             args.Deta, args.Dmu)
    optimizer = torch.optim.Adam(model.parameters(), lr=args.lr)

    print(f"REFERENCE beta run: beta={args.beta} nup={args.nup} "
          f"Z={args.Z} deltaE={args.deltaE} Nstates={model.Nstates} "
          f"boltzmann={args.boltzmann} batch={args.batch} "
          f"iternum={args.iternum} lr={args.lr} (scipy backend, CPU f64)",
          flush=True)

    with open(args.out, "w") as fh:
        fh.write(json.dumps({"config": vars(args),
                             "Nstates": model.Nstates}) + "\n")
        for i in range(1, args.iternum + 1):
            start = time.time()
            gradF_phi, gradF_theta = model(args.batch)
            optimizer.zero_grad()
            gradF_phi.backward()
            gradF_theta.backward()
            optimizer.step()
            dt = time.time() - start
            rec = {"iter": i, "F": model.F, "F_std": model.F_std,
                   "E": model.E, "E_std": model.E_std,
                   "S": model.S, "S_analytical": model.S_analytical,
                   "seconds": round(dt, 3)}
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(f"iter: {i:03d} F: {model.F:.6f} F_std: {model.F_std:.6f} "
                  f"E: {model.E:.6f} S: {model.S:.6f} "
                  f"S_ana: {model.S_analytical:.6f} ({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
