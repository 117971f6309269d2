"""O(1)-memory continuous-adjoint ODE solve via ``jax.custom_vjp``.

Capability parity with the reference's ``SolveIVP`` autograd primitive
(``src/NeuralODE/nnModule.py:8-99``): the forward pass saves only the FINAL
state; the backward pass reconstructs the trajectory by integrating the
augmented system (x, a_x, a_p) in reverse time, with

    dx/dt   = f(p, t, x)
    da_x/dt = -(∂f/∂x)ᵀ a_x
    da_p/dt = -(∂f/∂p)ᵀ a_x

The vjps come from ``jax.vjp`` of f, so the backward pass is itself built from
differentiable primitives and reverse-mode differentiates again
(grad-of-grad), mirroring the reference's ``create_graph=True``
(``src/NeuralODE/nnModule.py:127``).  Forward-mode (jvp) through a
``custom_vjp`` is not defined in JAX, which is why the local-energy engine
uses the direct scan solver (exact discrete gradients, any-order, see
``fermiflow_tpu.ode.integrators``) — the adjoint solver is the O(1)-memory
option for very deep integrations / parameter-gradient paths.

Note on exactness: the reverse pass re-integrates the dynamics, so gradients
match the forward discretization only up to the integration tolerance — the
same trade the reference makes (optimize-then-discretize).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from fermiflow_tpu.ode.integrators import odeint

__all__ = ["odeint_adjoint"]


# Static args lead: jax.custom_vjp requires nondiff_argnums to precede the
# differentiable arguments.
@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _odeint_adjoint(f, t0, t1, steps, method, params, x0):
    return odeint(f, params, x0, t0, t1, steps=steps, method=method)


def odeint_adjoint(
    f: Callable,
    params,
    x0,
    t0: float,
    t1: float,
    steps: int = 16,
    method: str = "dopri5",
):
    """Like ``odeint`` but with an O(1)-memory adjoint backward pass.

    t0/t1/steps/method are static (python numbers); params and x0 are
    differentiable pytrees.
    """
    return _odeint_adjoint(f, float(t0), float(t1), int(steps), method, params, x0)


def _fwd(f, t0, t1, steps, method, params, x0):
    xT = odeint(f, params, x0, t0, t1, steps=steps, method=method)
    return xT, (params, xT)


def _bwd(f, t0, t1, steps, method, res, ct_xT):
    params, xT = res

    def f_aug(p, t, aug):
        x, a_x, _ = aug
        fx, vjp_fn = jax.vjp(lambda pp, xx: f(pp, t, xx), p, x)
        vjp_p, vjp_x = vjp_fn(a_x)
        neg = lambda tree: jax.tree_util.tree_map(jnp.negative, tree)
        return (fx, neg(vjp_x), neg(vjp_p))

    a_p0 = jax.tree_util.tree_map(jnp.zeros_like, params)
    aug0 = (xT, ct_xT, a_p0)
    _, a_x, a_p = odeint(f_aug, params, aug0, t1, t0, steps=steps, method=method)
    return (a_p, a_x)


_odeint_adjoint.defvjp(_fwd, _bwd)
