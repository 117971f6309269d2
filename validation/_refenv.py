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

# --- Host-side NaN fix for the reference's second-order backward ---------
#
# ``Backflow._e_e_divergence`` (``/root/reference/src/equivariant_funs.py:
# 33-50``) computes ``rij.norm(dim=-1)`` over the FULL pair matrix —
# including the exactly-zero diagonal — and only then slices to the
# off-diagonal pairs.  norm's FIRST backward is special-cased to 0 at the
# origin, but its SECOND backward there is 0/0 = NaN on this host's torch.
# That NaN enters the doubly-augmented adjoint ODE that
# ``y_grad_laplacian`` (``src/utils.py:40-65``) integrates for every
# laplacian component, and scipy RK45 then loops forever (error estimate
# NaN -> step rejected -> dt *= NaN; measured: >12 h per solve at any
# batch, t=NaN — see validation/diag_ref_laplacian.py and diag_ref_nan.py).
#
# The fix is a numerical IDENTITY: select the off-diagonal pairs FIRST,
# then take the norm.  Forward output is torch.equal-identical; the only
# change is that the dead zero-diagonal branch never enters the autograd
# graph.  Without this patch the reference's local energy is not
# computable at all via its only runnable backend here (scipy/CPU).
import equivariant_funs as _eqf  # noqa: E402


def _e_e_divergence_no_diag(self, x):
    _, n, dim = x.shape
    row_indices, col_indices = torch.triu_indices(n, n, offset=1)
    rij = (x[:, :, None] - x[:, None])[:, row_indices, col_indices, :]
    dij = rij.norm(dim=-1, keepdim=True)
    eta, d_eta = self.eta(dij), self.eta.grad(dij)
    return 2 * (d_eta * dij + dim * eta).sum(dim=(-2, -1))


_eqf.Backflow._e_e_divergence = _e_e_divergence_no_diag

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
