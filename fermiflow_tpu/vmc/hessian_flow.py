"""Hessian-flow local energy: evolve (logp, score, Hessian) along the flow.

The reference computes the local energy by reverse-integrating the CNF to get
logp(x) and then looping 2n*dim sequential ``autograd.grad`` calls through the
whole adjoint solve (``src/utils.py:40-65`` called at ``src/VMC.py:48``); our
first TPU engine replaced that with batched nested-jvp directions
(``vmc/local_energy.py``) — still 2n*dim second-order tangent channels
through every ODE step.

This module removes second-order autodiff from the hot loop entirely.  Along
the GENERATIVE flow dx/dt = v(x), the log-density and its derivatives at the
moving point x(t) obey closed ODEs (continuity equation, differentiated):

    d logp / dt = -div v
    d g    / dt = -grad(div v) - A^T g          g = grad_x logp,  A = dv/dx
    d H    / dt = -grad^2(div v) - (grad^2 v).g - A^T H - H A

so ONE forward integration of the augmented state (x, logp, g, H) from the
known base sample z — whose (logp, g, H) at t0 come from one small autodiff
evaluation of the base Slater density — yields x, logp(x), grad logp and the
full Hessian at x(t1).  The kinetic energy is then

    -1/4 tr H - 1/8 |g|^2.

All RHS tensors (A, grad div, grad^2 div, (grad^2 v).g) come in closed form
from ``nn/backflow_derivs.py``; the per-walker tensors are tiny
((n*dim)^2 = 144 floats at N=6) and the update is pure batched linear
algebra.  Exactness: with the SAME fixed grid, this computes derivatives of a
slightly different discrete map than differentiating-the-solver; both
converge to the continuous flow at the tableau's order, and the eigenstate
oracles (identity flow => exact Eloc) hold exactly because v = 0 makes the
augmented system trivial.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from fermiflow_tpu.ode import odeint

__all__ = ["base_val_grad_hess", "hessian_flow", "local_energy_flow"]

_HI = jax.lax.Precision.HIGHEST  # H-update matmuls feed the Laplacian


def base_val_grad_hess(logp_single: Callable, z: jax.Array, *args):
    """(logp, grad, Hessian) of the base log-density at z, per walker.

    One reverse pass + n*dim forward columns (jacfwd-of-jacrev), vmapped over
    the batch — a one-time cost outside the ODE loop.

    Args:
      logp_single: (z_single, *a) -> scalar, z_single of shape (n, dim).
      z: (batch, n, dim); *args: per-walker extras (leading batch axis).

    Returns:
      (y, g, H): (batch,), (batch, nd), (batch, nd, nd).
    """
    n, dim = z.shape[-2:]
    nd = n * dim

    def single(zs, *a):
        zf = zs.reshape(nd)
        f = lambda v: logp_single(v.reshape(n, dim), *a)
        y = f(zf)
        grad_f = jax.grad(f)
        g = grad_f(zf)
        H = jax.jacfwd(grad_f)(zf)
        return y, g, H

    return jax.vmap(single)(z, *args)


def hessian_flow(
    field_tensors: Callable,
    params,
    z: jax.Array,
    y0: jax.Array,
    g0: jax.Array,
    H0: jax.Array,
    t0: float,
    t1: float,
    steps: int = 16,
    method: str = "dopri5",
):
    """Integrate the augmented (x, logp, g, H) system from t0 to t1.

    Args:
      field_tensors: (params, x, g_matrix) -> dict(v, div, gdiv, A, S, T)
        with g_matrix shaped (..., n, dim) (see nn/backflow_derivs.py).
      params: field parameters.
      z: (batch, n, dim) start positions.
      y0, g0, H0: base logp/score/Hessian at z — (batch,), (batch, nd),
        (batch, nd, nd).
      t0, t1, steps, method: fixed-grid solve of the augmented system.

    Returns:
      (x, logp, g, H) at t1 with the same shapes (x as (batch, n, dim)).
    """
    n, dim = z.shape[-2:]

    def rhs(p, t, state):
        x, _, g, H = state
        ft = field_tensors(p, x, g.reshape(g.shape[:-1] + (n, dim)))
        A = ft["A"]
        At_g = jnp.einsum("...ca,...c->...a", A, g, precision=_HI)
        AtH = jnp.einsum("...ca,...cb->...ab", A, H, precision=_HI)
        HA = jnp.einsum("...ac,...cb->...ab", H, A, precision=_HI)
        return (
            ft["v"],
            -ft["div"],
            -(ft["gdiv"] + At_g),
            -(ft["S"] + ft["T"] + AtH + HA),
        )

    return odeint(rhs, params, (z, y0, g0, H0), t0, t1, steps=steps, method=method)


def local_energy_flow(
    field_tensors: Callable,
    base_logp_single: Callable,
    potential: Callable,
    params,
    z: jax.Array,
    t0: float,
    t1: float,
    steps: int = 16,
    method: str = "dopri5",
    base_args: tuple = (),
    backend: str = "xla",
    pallas_interpret: bool = False,
    mesh=None,
    return_grad: bool = False,
    base_vgh: Callable | None = None,
):
    """Per-walker local energies from base samples, one forward pass.

    Args:
      field_tensors: closed-form field derivative tensors (see above).
      base_logp_single: per-walker base log-density, ((n, dim), *a) -> scalar.
      potential: batched potential energy, (batch, n, dim) -> (batch,).
      params: field parameters.
      z: (batch, n, dim) base samples (walkers in base space).
      base_args: per-walker extras for the base density (e.g. the
        finite-temperature state index), each with a leading batch axis.
      backend: "xla" (generic field_tensors) or "pallas" (fused TPU kernel
        for the backflow field, float32/dim=2 —
        ops/pallas_hessian_flow.py); pallas_interpret runs the kernel in
        the TPU interpreter for CPU tests.
      base_vgh: optional closed-form (z, *base_args) -> (y0, g0, H0)
        (e.g. ``FreeFermion.log_prob_vgh``); when given it replaces the
        nested-autodiff ``base_val_grad_hess`` evaluation.

    Returns:
      (x, eloc, logp): generated positions, local energies and log p(x),
      shapes (batch, n, dim), (batch,), (batch,).  With ``return_grad`` also
      the score g = grad_x log p at x, (batch, n*dim) — the terminal adjoint
      seed of the fused REINFORCE-gradient kernel (ops/pallas_reinforce.py).
    """
    if base_vgh is not None:
        y0, g0, H0 = base_vgh(z, *base_args)
    else:
        y0, g0, H0 = base_val_grad_hess(base_logp_single, z, *base_args)
    if backend == "pallas":
        from fermiflow_tpu.ops.pallas_hessian_flow import (
            hessian_flow_pallas,
            hessian_flow_pallas_sharded,
        )

        if mesh is not None:
            x, logp, g, H = hessian_flow_pallas_sharded(
                mesh, params, z, y0, g0, H0, t0, t1,
                steps=steps, method=method, interpret=pallas_interpret,
            )
        else:
            x, logp, g, H = hessian_flow_pallas(
                params, z, y0, g0, H0, t0, t1, steps=steps, method=method,
                interpret=pallas_interpret,
            )
    else:
        x, logp, g, H = hessian_flow(
            field_tensors, params, z, y0, g0, H0, t0, t1,
            steps=steps, method=method,
        )
    lap = jnp.trace(H, axis1=-2, axis2=-1)
    kinetic = -0.25 * lap - 0.125 * jnp.sum(g**2, axis=-1)
    eloc = kinetic + potential(x)
    if return_grad:
        return x, eloc, logp, g
    return x, eloc, logp
