"""Diagnose the reference's y_grad_laplacian cost at trained parameters.

Round-2/3 finding: the reference's local-energy laplacian
(``/root/reference/src/utils.py:40-65``) backprops through the adjoint
solve's own SolveIVP node (``src/NeuralODE/nnModule.py:77-100``), i.e. each
of the n*dim laplacian components integrates a DOUBLY-augmented reverse ODE
with scipy RK45 at rtol=1e-6/atol=1e-8.  At batch>=4 these solves ran >12 h
without completing on this host.  This script instruments scipy.solve_ivp
with progress (nfev, t, max|y|) to identify the failure mode: tiny adaptive
steps (stiffness), state blow-up, or plain per-eval cost.

Usage:
    timeout 900 python validation/diag_ref_laplacian.py --batch 2 \
        --params validation/runs/params_n3.npz [--rtol 1e-6 --atol 1e-8] \
        [--method RK45] [--ncomp 1]
"""

import argparse
import time

import numpy as np

import _refenv  # noqa: F401
import torch

import NeuralODE.nnModule as nnm  # noqa: E402  (reference module)
from scipy.integrate import solve_ivp as _scipy_solve_ivp  # noqa: E402


def make_instrumented(method, report_every=500):
    def solve_ivp_logged(fun, t_span, y0, **kw):
        state = {"nfev": 0, "t0": time.time(), "last": 0}

        def fun_logged(t, y):
            state["nfev"] += 1
            if state["nfev"] - state["last"] >= report_every:
                state["last"] = state["nfev"]
                dt = time.time() - state["t0"]
                print(f"    [solve dim={len(y0)}] nfev={state['nfev']} "
                      f"t={t:+.6f} max|y|={np.abs(y).max():.3e} "
                      f"({dt:.1f}s, {state['nfev']/dt:.0f} evals/s)",
                      flush=True)
            return fun(t, y)

        if method != "RK45":
            kw["method"] = method
        sol = solve_ivp_logged.inner(fun_logged, t_span, y0, **kw)
        dt = time.time() - state["t0"]
        print(f"    [solve dim={len(y0)}] DONE nfev={state['nfev']} "
              f"({dt:.1f}s) success={sol.success}", flush=True)
        return sol

    solve_ivp_logged.inner = _scipy_solve_ivp
    return solve_ivp_logged


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--params", type=str, default=None)
    p.add_argument("--nup", type=int, default=3)
    p.add_argument("--Z", type=float, default=0.5)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--rtol", type=float, default=1e-6)
    p.add_argument("--atol", type=float, default=1e-8)
    p.add_argument("--method", type=str, default="RK45")
    p.add_argument("--ncomp", type=int, default=1,
                   help="how many laplacian components to time (of n*dim)")
    p.add_argument("--seed", type=int, default=123)
    args = p.parse_args()

    nnm.solve_ivp = make_instrumented(args.method)

    orig = _refenv.scipy_solve

    def tol_solve(f, t_span, x0s, params_require_grad=True,
                  implementation="scipy", rtol=None, atol=None):
        return orig(f, t_span, x0s, params_require_grad,
                    "scipy", args.rtol, args.atol)

    nnm.solve_ivp_nnmodule = tol_solve
    import flow
    flow.solve_ivp_nnmodule = tol_solve

    torch.manual_seed(args.seed)
    model = _refenv.build_gs_model(args.nup, 0, args.Z, 50, 50)
    if args.params:
        d = np.load(args.params)
        eta = {k: d[f"eta_{k}"] for k in ("w1", "b1", "w2")}
        mu = ({k: d[f"mu_{k}"] for k in ("w1", "b1", "w2")}
              if "mu_w1" in d.files else None)
        _refenv.load_backflow_params_into(model, eta, mu)

    t0 = time.time()
    _, x = model.sample((args.batch,))
    print(f"sample: {time.time()-t0:.2f}s", flush=True)

    x = x.detach().requires_grad_(True)
    x_flat = x.flatten(start_dim=1)

    t0 = time.time()
    y = model.logp(x_flat.view_as(x))
    print(f"logp: {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    grad_flat, = torch.autograd.grad(
        y, x_flat, grad_outputs=torch.ones(args.batch), create_graph=True)
    print(f"grad (create_graph): {time.time()-t0:.2f}s", flush=True)

    dim = x_flat.shape[1]
    for i in range(min(args.ncomp, dim)):
        t0 = time.time()
        gi = torch.autograd.grad(grad_flat[:, i], x_flat,
                                 grad_outputs=torch.ones(args.batch),
                                 retain_graph=True)[0][:, i]
        print(f"laplacian component {i}: {time.time()-t0:.2f}s "
              f"value[0]={gi[0].item():+.6e}", flush=True)


if __name__ == "__main__":
    main()
