"""Cross-framework wavefunction identity check at trained parameters.

Loads fermiflow_tpu-trained backflow parameters into the reference's torch
modules and compares log p(x) = 2 log |psi(x)| pointwise: the reference
integrates its reverse likelihood ODE with adaptive scipy (rtol=1e-6,
atol=1e-8, ``/root/reference/src/NeuralODE/nnModule.py:49-61``), ours with
the fixed-grid dopri5 production solver (N=3 check at ode_steps=16;
the production default is ode_steps=8, config.py, backed by
validation/ode_steps_study.py).

Recorded result (docs/VALIDATION.md): max |Δlogp| ≈ 1e-10 over random
positions at the converged N=3 Z=0.5 parameters — the two frameworks
represent the SAME wavefunction, and the fixed 16-step grid matches the
reference's adaptive tolerance regime to 10 decimal places at trained
parameters.

Usage:
    python validation/crosscheck_logp.py --params validation/runs/params_n3.npz
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo/validation")
sys.path.insert(0, "/root/repo")

import _refenv  # noqa: E402
import torch  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--params", type=str,
                   default="validation/runs/params_n3.npz")
    p.add_argument("--nup", type=int, default=3)
    p.add_argument("--Z", type=float, default=0.5)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--ode-steps", type=int, default=16)
    args = p.parse_args()

    d = np.load(args.params)
    eta = {k: d[f"eta_{k}"] for k in ("w1", "b1", "w2")}
    mu = ({k: d[f"mu_{k}"] for k in ("w1", "b1", "w2")}
          if "mu_w1" in d.files else None)
    model = _refenv.build_gs_model(args.nup, 0, args.Z,
                                   eta["b1"].shape[0],
                                   mu["b1"].shape[0] if mu else 8)
    _refenv.load_backflow_params_into(model, eta, mu)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(args.batch, args.nup, 2))
    logp_ref = model.logp(torch.from_numpy(x)).detach().numpy()

    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import jax.numpy as jnp
    from fermiflow_tpu.cli import common
    from fermiflow_tpu.config import Config

    cfg = Config(nup=args.nup, Z=args.Z, dtype="float64",
                 ode_steps=args.ode_steps)
    ours, _ = common.build_gs(cfg)
    params = {"eta": {k: jnp.asarray(v) for k, v in eta.items()},
              "mu": None if mu is None
              else {k: jnp.asarray(v) for k, v in mu.items()}}
    logp_ours = np.asarray(ours.log_prob(params, jnp.asarray(x)))
    err = np.abs(logp_ours - logp_ref)
    print(f"max|dlogp| = {err.max():.3e}   mean|dlogp| = {err.mean():.3e}")
    assert err.max() < 1e-6, "cross-framework wavefunction mismatch"
    print("CROSSCHECK OK")


if __name__ == "__main__":
    main()
