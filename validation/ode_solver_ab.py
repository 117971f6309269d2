"""A/B: adaptive dopri5 vs production fixed grid, ON CHIP, at trained params.

The reference's production solver is adaptive dopri5 rtol=1e-6/atol=1e-8
(``src/NeuralODE/nnModule.py:62-67``); fermiflow_tpu's production path is the
fixed 8-step grid, justified round 2 by a float64 CPU error study
(validation/ode_steps_study.py).  This driver closes the remaining gap
(round-3 VERDICT residual #2) by comparing the two GENERATE-path solvers on
the TPU itself, f32, at the CONVERGED N=6 Z=0.5 parameters
(validation/runs/params_n6.npz) — the exact configuration production runs:

  * max / mean |x_adaptive - x_fixed| over a batch of equilibrated walkers;
  * the energy estimated on both sample sets with the same estimator.

Both solvers are now user-selectable on the CLI via ``--ode-solver
{fixed,adaptive,adjoint}`` (+ ``--rtol/--atol``).

    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    python validation/ode_solver_ab.py --out validation/runs/ode_solver_ab.json
"""

import argparse
import dataclasses
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fermiflow_tpu.cli import common
from fermiflow_tpu.config import Config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--params", type=str,
                   default="validation/runs/params_n6.npz")
    p.add_argument("--nup", type=int, default=6)
    p.add_argument("--Z", type=float, default=0.5)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--equil", type=int, default=300)
    p.add_argument("--ode-steps", type=int, default=8)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    assert jax.devices()[0].platform == "tpu", "A/B runs on the chip"
    dtype = jnp.float32

    d = np.load(args.params)
    params = {
        "eta": {"w1": jnp.asarray(d["eta_w1"], dtype),
                "b1": jnp.asarray(d["eta_b1"], dtype),
                "w2": jnp.asarray(d["eta_w2"], dtype)},
        "mu": {"w1": jnp.asarray(d["mu_w1"], dtype),
               "b1": jnp.asarray(d["mu_b1"], dtype),
               "w2": jnp.asarray(d["mu_w2"], dtype)},
    }

    cfg = Config(nup=args.nup, Z=args.Z, batch=args.batch,
                 ode_steps=args.ode_steps, equilibrium_steps=args.equil,
                 pallas_sampler=True, pallas_local_energy=True,
                 dtype="float32")
    model, _ = common.build_gs(cfg)
    cnf_fixed = common.make_cnf(cfg)
    cnf_adapt = dataclasses.replace(cnf_fixed, solver="adaptive")

    # Equilibrated base walkers via the fused sampler.
    from fermiflow_tpu.ops.pallas_metropolis import metropolis_free_fermion
    from fermiflow_tpu.train import _gs_occupations

    nx_occ, ny_occ, _, _, kshells = _gs_occupations(model)
    z0 = jax.random.normal(jax.random.PRNGKey(0),
                           (args.batch, model.n, 2), dtype)
    z, _, _ = jax.jit(
        lambda z: metropolis_free_fermion(
            z, 1234, 0.1, args.equil, nx_occ, ny_occ, kshells)
    )(z0)

    x_fixed = jax.jit(lambda p, z: cnf_fixed.generate(p, z))(params, z)
    x_adapt = jax.jit(lambda p, z: cnf_adapt.generate(p, z))(params, z)
    dx = jnp.abs(x_fixed - x_adapt)

    # Same estimator (reverse-logp Eloc) on both transported sample sets.
    @jax.jit
    def energy_at_x(p, x):
        _, metrics = model.loss_and_metrics(p, x)
        return metrics["E"], metrics["E_std"]

    Ef, Ef_std = energy_at_x(params, x_fixed)
    Ea, Ea_std = energy_at_x(params, x_adapt)
    sem = float(Ef_std) / np.sqrt(args.batch)

    res = {
        "config": {"nup": args.nup, "Z": args.Z, "batch": args.batch,
                   "ode_steps": args.ode_steps,
                   "rtol": cfg.rtol, "atol": cfg.atol,
                   "params": args.params, "platform": "tpu", "dtype": "f32"},
        "max_abs_dx": float(jnp.max(dx)),
        "mean_abs_dx": float(jnp.mean(dx)),
        "E_fixed": float(Ef),
        "E_adaptive": float(Ea),
        "abs_dE": abs(float(Ef) - float(Ea)),
        "mc_sem": sem,
        "dE_over_sem": abs(float(Ef) - float(Ea)) / sem,
    }
    print(json.dumps(res, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
