"""Root-cause the NaN in the reference's scipy second-order backward.

diag_ref_laplacian.py showed: forward + first-order adjoint solves finish in
~20 RHS evals, but the doubly-augmented solve (laplacian components of
``y_grad_laplacian``, ``/root/reference/src/utils.py:62``) yields NaN from
the first steps and scipy RK45 loops forever (t=nan).  This script wraps the
reference's ``augmented_dynamics`` RHS with NaN checks to localize which
input/output tensor goes NaN first.

Usage:
    timeout 300 python validation/diag_ref_nan.py --params runs/params_n3.npz
"""

import argparse

import numpy as np

import _refenv  # noqa: F401
import torch

import NeuralODE.nnModule as nnm  # noqa: E402

_orig_aug = nnm.augmented_dynamics
_call_count = {"n": 0}


def aug_logged(f, xs_shapes_numels, params_require_grad):
    mod = _orig_aug(f, xs_shapes_numels, params_require_grad)
    depth = getattr(f, "_aug_depth", 0) + 1
    mod._aug_depth = depth
    orig_forward = mod.forward

    def forward(t, x_aug):
        out = orig_forward(t, x_aug)
        _call_count["n"] += 1
        if _call_count["n"] <= 8 or any(
                torch.isnan(o).any() for o in out):
            in_nan = [int(torch.isnan(x).sum()) for x in x_aug]
            out_nan = [int(torch.isnan(o).sum()) for o in out]
            in_max = [float(x.abs().max()) for x in x_aug]
            out_max = [float(o.abs().max()) if not torch.isnan(o).any()
                       else float("nan") for o in out]
            print(f"  f_aug(depth={depth}) eval#{_call_count['n']} t={t:.4f}\n"
                  f"    in_nan={in_nan} in_max={[f'{v:.2e}' for v in in_max]}\n"
                  f"    out_nan={out_nan} out_max={[f'{v!s:.9}' for v in out_max]}",
                  flush=True)
            if any(out_nan) and _call_count["n"] > 20:
                raise SystemExit("NaN localized; stopping")
        return out

    mod.forward = forward
    return mod


nnm.augmented_dynamics = aug_logged


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--params", type=str, default=None)
    p.add_argument("--nup", type=int, default=3)
    p.add_argument("--Z", type=float, default=0.5)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=123)
    args = p.parse_args()

    torch.manual_seed(args.seed)
    model = _refenv.build_gs_model(args.nup, 0, args.Z, 50, 50)
    if args.params:
        d = np.load(args.params)
        eta = {k: d[f"eta_{k}"] for k in ("w1", "b1", "w2")}
        mu = ({k: d[f"mu_{k}"] for k in ("w1", "b1", "w2")}
              if "mu_w1" in d.files else None)
        _refenv.load_backflow_params_into(model, eta, mu)

    _, x = model.sample((args.batch,))
    x = x.detach().requires_grad_(True)
    x_flat = x.flatten(start_dim=1)
    y = model.logp(x_flat.view_as(x))
    grad_flat, = torch.autograd.grad(
        y, x_flat, grad_outputs=torch.ones(args.batch), create_graph=True)
    print("first-order grad ok:", bool(torch.isfinite(grad_flat).all()),
          flush=True)
    gi = torch.autograd.grad(grad_flat[:, 0], x_flat,
                             grad_outputs=torch.ones(args.batch),
                             retain_graph=True)[0][:, 0]
    print("laplacian comp 0:", gi, flush=True)


if __name__ == "__main__":
    main()
