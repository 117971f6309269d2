"""Adaptive Dormand–Prince 5(4) with embedded error control, jit-compatible.

Tolerance parity with the reference solver stack (torchdiffeq dopri5 at
rtol=1e-6, atol=1e-8 — ``src/NeuralODE/nnModule.py:62-67,161-162``), done the
XLA way:

  * ``differentiable=False`` (default): a ``lax.while_loop`` stepper — minimal
    work, used on the sampling path where no gradients are needed.
  * ``differentiable=True``: a bounded ``lax.scan`` over ``max_steps`` with
    masked no-op steps after the interval is consumed — reverse-mode
    differentiable (scan transposes; while_loop does not), at the cost of
    always paying ``max_steps`` of compute.  Use the fixed-grid solver when
    the step count is known; this variant exists to demonstrate tolerance
    parity under differentiation.

Both variants share one step implementation and the standard PI-free step
controller h <- h * clip(0.9 * err^(-1/5), 0.2, 5).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from fermiflow_tpu.ode.integrators import TABLEAUS, _axpy

__all__ = ["odeint_adaptive"]

# 4th-order embedded weights for the error estimate (b5 - b4), including the
# FSAL 7th stage.  Kept as python floats (weak types) so the state dtype is
# preserved under x64.
_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_B4 = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)
_ERR = tuple(float(v) for v in (_B5 - _B4))
_A7 = tuple(float(v) for v in _B5[:6])  # stage-7 node == 5th-order solution (FSAL)
_B5 = tuple(float(v) for v in _B5)
_DOPRI = TABLEAUS["dopri5"]


def _dopri_step(f, params, t, h, x):
    """One dopri5 step: returns (x5, err_tree) with 7 stage evaluations."""
    ks = []
    for i in range(6):
        xi = _axpy(x, h, _DOPRI.a[i], ks) if i else x
        ks.append(f(params, t + _DOPRI.c[i] * h, xi))
    x5 = _axpy(x, h, _A7, ks)
    ks.append(f(params, t + h, x5))
    err = _axpy(jax.tree_util.tree_map(jnp.zeros_like, x), h, _ERR, ks)
    return x5, err


def _error_norm(x, x_new, err, rtol, atol):
    leaves_x = jax.tree_util.tree_leaves(x)
    leaves_new = jax.tree_util.tree_leaves(x_new)
    leaves_err = jax.tree_util.tree_leaves(err)
    total = 0.0
    count = 0
    for xl, nl, el in zip(leaves_x, leaves_new, leaves_err):
        scale = atol + rtol * jnp.maximum(jnp.abs(xl), jnp.abs(nl))
        total = total + jnp.sum((el / scale) ** 2)
        count += xl.size
    # Floor keeps sqrt's gradient finite when the error vanishes (the masked
    # no-op steps of the differentiable variant hit exactly zero error).
    # Dtype-aware: a 1e-300 literal underflows to 0.0 in float32, which
    # would silently disable the guard exactly on the TPU dtype.
    ratio = total / count
    tiny = jnp.finfo(jnp.result_type(ratio)).tiny
    return jnp.sqrt(jnp.maximum(ratio, tiny))


def odeint_adaptive(
    f: Callable,
    params,
    x0,
    t0: float,
    t1: float,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    max_steps: int = 512,
    differentiable: bool = False,
):
    """Integrate dx/dt = f(params, t, x) from t0 to t1 adaptively.

    Supports backward time (t1 < t0).  Returns the state pytree at t1.
    """
    dtype = jnp.result_type(*jax.tree_util.tree_leaves(x0))
    sign = 1.0 if t1 >= t0 else -1.0
    t0a = jnp.asarray(t0, dtype=dtype)
    t1a = jnp.asarray(t1, dtype=dtype)
    h0 = (t1a - t0a) / 16.0

    def cond(carry):
        t, _, _, n = carry
        return ((t - t1a) * sign < 0) & (n < max_steps)

    def attempt(carry):
        t, x, h, n = carry
        # Never overshoot the endpoint.
        h = sign * jnp.minimum(jnp.abs(h), jnp.abs(t1a - t))
        x_new, err = _dopri_step(f, params, t, h, x)
        enorm = _error_norm(x, x_new, err, rtol, atol)
        accept = enorm <= 1.0
        x = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), x, x_new
        )
        t = jnp.where(accept, t + h, t)
        factor = jnp.clip(
            0.9 * jnp.power(jnp.maximum(enorm, 1e-10), -0.2), 0.2, 5.0
        )
        return t, x, h * factor, n + 1

    if not differentiable:
        _, xT, _, _ = jax.lax.while_loop(cond, attempt, (t0a, x0, h0, 0))
        return xT

    def scan_step(carry, _):
        t, x, h, n = carry
        done = jnp.logical_not(cond(carry))
        # Dummy step size on finished lanes: keeps the (discarded) attempt
        # NaN-free so no 0*NaN leaks through the where-mask in the backward
        # pass (double-where trick).
        h_safe = jnp.where(done, jnp.ones_like(h), h)
        # Same trick for t: on finished lanes |t1 - t| = 0 would re-zero h
        # inside the overshoot clip.
        t_safe = jnp.where(done, t0a, t)
        t2, x2, h2, n2 = attempt((t_safe, x, h_safe, n))
        t = jnp.where(done, t, t2)
        h = jnp.where(done, h, h2)
        n = jnp.where(done, n, n2)
        x = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), x, x2)
        return (t, x, h, n), None

    (_, xT, _, _), _ = jax.lax.scan(
        scan_step, (t0a, x0, h0, 0), None, length=max_steps
    )
    return xT
