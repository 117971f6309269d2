"""Import the reference (buwantaiji/FermiFlow) as a CPU/scipy library.

Shared preamble for the validation drivers: stubs torchdiffeq (not installed
here; the reference imports it at module scope, ``src/NeuralODE/nnModule.py:6``)
and patches every module-level binding of ``solve_ivp_nnmodule`` so both the
forward CNF solves and the adjoint's internal backward solve use the scipy
backend (``src/NeuralODE/nnModule.py:49-61``) — the reference's only runnable
backend on this host.
"""

import sys
import types

_fake = types.ModuleType("torchdiffeq")


def _no_odeint(*a, **k):
    raise RuntimeError("torchdiffeq is unavailable; scipy backend only")


_fake.odeint = _no_odeint
sys.modules.setdefault("torchdiffeq", _fake)
if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

import torch  # noqa: E402

torch.set_default_dtype(torch.float64)

import NeuralODE.nnModule as nnm  # noqa: E402

_orig_solve = nnm.solve_ivp_nnmodule


def scipy_solve(f, t_span, x0s, params_require_grad=True,
                implementation="scipy", rtol=1e-6, atol=1e-8):
    return _orig_solve(f, t_span, x0s, params_require_grad, "scipy",
                       rtol, atol)


nnm.solve_ivp_nnmodule = scipy_solve

import flow  # noqa: E402

flow.solve_ivp_nnmodule = scipy_solve


def build_gs_model(nup, ndown, Z, Deta, Dmu, t0=0.0, t1=1.0):
    """Reference GSVMC on CPU, identity-initialized flow."""
    from base_dist import FreeFermion
    from equivariant_funs import Backflow
    from MLP import MLP
    from orbitals import HO2D
    from potentials import HO, CoulombPairPotential
    from VMC import GSVMC

    device = torch.device("cpu")
    orbitals = HO2D()
    basedist = FreeFermion(device=device)
    eta = MLP(1, Deta)
    eta.init_zeros()
    mu = MLP(1, Dmu)
    mu.init_zeros()
    v = Backflow(eta, mu=mu)
    cnf = flow.CNF(v, (t0, t1))
    model = GSVMC(nup, ndown, orbitals, basedist, cnf,
                  CoulombPairPotential(Z), sp_potential=HO())
    model.to(device=device)
    return model


def load_backflow_params_into(model, eta_params, mu_params):
    """Copy fermiflow_tpu backflow MLP params into the reference's modules.

    Layout map (fermiflow_tpu/nn/mlp.py vs /root/reference/src/MLP.py):
    ours applies ``x @ w1 + b1`` with w1 (d_in, h); torch Linear applies
    ``x @ W.T + b`` with fc1.weight (h, d_in) — so fc1.weight = w1.T,
    fc1.bias = b1, fc2.weight = w2.T (bias-free).
    """
    eta, mu = model.cnf.backflow_potential()
    with torch.no_grad():
        eta.fc1.weight.copy_(torch.from_numpy(eta_params["w1"].T))
        eta.fc1.bias.copy_(torch.from_numpy(eta_params["b1"]))
        eta.fc2.weight.copy_(torch.from_numpy(eta_params["w2"].T))
        if mu_params is not None:
            mu.fc1.weight.copy_(torch.from_numpy(mu_params["w1"].T))
            mu.fc1.bias.copy_(torch.from_numpy(mu_params["b1"]))
            mu.fc2.weight.copy_(torch.from_numpy(mu_params["w2"].T))
