"""Fixed-grid explicit Runge-Kutta integrators as ``lax.scan`` kernels.

This is the compute core that replaces torchdiffeq + scipy.solve_ivp in the
reference (``src/NeuralODE/nnModule.py:5-6,49-67``).  Design:

  * One code path, any tableau (Euler, midpoint, RK4, fixed-step Dormand-
    Prince 5).  The step loop is a ``lax.scan`` — a single compiled region,
    static trip count, TPU-friendly (no host-driven stepping, no dynamic
    shapes).
  * State is an arbitrary pytree; ``f(params, t, x)`` returns a matching
    pytree.  Time may run backwards (t1 < t0), which the CNF likelihood path
    uses (reference ``src/flow.py:51-55``).
  * Fully differentiable to arbitrary order by construction
    (discretize-then-optimize): JAX differentiates the scan, giving EXACT
    gradients of the discrete trajectory — unlike the reference's continuous
    adjoint whose gradients carry an extra integration error.  Memory is
    O(steps) activations; ``remat=True`` rematerializes each step to cut that
    by ~the stage count.  For a strictly O(1)-memory backward, see
    ``fermiflow_tpu.ode.adjoint``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["odeint", "odeint_trajectory", "TABLEAUS"]


class _Tableau:
    # Coefficients are plain python floats: weakly typed under JAX promotion,
    # so the state keeps its dtype (f32 on TPU, f64 in tests) — numpy f64
    # scalars would silently upcast f32 states when x64 is enabled.
    def __init__(self, a, b, c):
        self.a = [tuple(float(v) for v in row) for row in a]
        self.b = tuple(float(v) for v in b)
        self.c = tuple(float(v) for v in c)
        self.stages = len(self.b)


TABLEAUS = {
    "euler": _Tableau(a=[[]], b=[1.0], c=[0.0]),
    "midpoint": _Tableau(a=[[], [0.5]], b=[0.0, 1.0], c=[0.0, 0.5]),
    "rk4": _Tableau(
        a=[[], [0.5], [0.0, 0.5], [0.0, 0.0, 1.0]],
        b=[1 / 6, 1 / 3, 1 / 3, 1 / 6],
        c=[0.0, 0.5, 0.5, 1.0],
    ),
    # Dormand–Prince 5(4), 5th-order weights; the 7th (FSAL) stage has zero
    # weight in the 5th-order solution and is omitted on the fixed grid.
    "dopri5": _Tableau(
        a=[
            [],
            [1 / 5],
            [3 / 40, 9 / 40],
            [44 / 45, -56 / 15, 32 / 9],
            [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
            [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
        ],
        b=[35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
        c=[0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0],
    ),
}


def _axpy(x, h, coefs, ks):
    """x + h * sum_j coefs[j] * ks[j], over pytrees."""
    def leaf(xl, *kls):
        acc = xl
        for cj, klj in zip(coefs, kls):
            if cj != 0.0:
                acc = acc + (h * cj) * klj
        return acc

    return jax.tree_util.tree_map(leaf, x, *ks)


def rk_step(f: Callable, params, t, h, x, tableau: _Tableau):
    """One explicit RK step; returns (x_next, ks) with ks the stage slopes."""
    ks = []
    for i in range(tableau.stages):
        xi = _axpy(x, h, tableau.a[i], ks) if i else x
        ks.append(f(params, t + tableau.c[i] * h, xi))
    return _axpy(x, h, tableau.b, ks), ks


def _odeint_impl(f, params, x0, t0, t1, steps, method, remat):
    tableau = TABLEAUS[method]
    h = (t1 - t0) / steps

    def step(x, i):
        t = t0 + i * h
        x_next, _ = rk_step(f, params, t, h, x, tableau)
        return x_next, None

    if remat:
        step = jax.checkpoint(step)
    xT, _ = jax.lax.scan(step, x0, jnp.arange(steps, dtype=jnp.result_type(float)))
    return xT


def odeint(
    f: Callable,
    params,
    x0,
    t0: float,
    t1: float,
    steps: int = 16,
    method: str = "dopri5",
    remat: bool = False,
):
    """Integrate dx/dt = f(params, t, x) from t0 to t1 on a fixed grid.

    Args:
      f: RHS, (params, t, pytree) -> pytree.
      params: parameter pytree (differentiable).
      x0: initial state pytree (differentiable).
      t0, t1: integration interval; t1 < t0 integrates backwards.
      steps: number of grid steps (static).
      method: one of ``TABLEAUS``.
      remat: rematerialize each step in the backward pass (memory ~/steps).

    Returns:
      State pytree at t1.
    """
    return _odeint_impl(f, params, x0, t0, t1, steps, method, remat)


def odeint_trajectory(
    f: Callable,
    params,
    x0,
    ts: jax.Array,
    steps_per_frame: int = 4,
    method: str = "dopri5",
):
    """Integrate and return the state at each time in ``ts``.

    Capability of the reference's density-movie path (``src/flow.py:46-48``,
    raw torchdiffeq odeint over ``linspace(t0, t1, nframes)``): frame i is
    reached from frame i-1 with ``steps_per_frame`` fixed sub-steps.

    Returns a pytree of arrays with a leading ``len(ts)`` axis (x0 included
    as the first frame when ts[0] is the start time).
    """
    tableau = TABLEAUS[method]

    def frame(x, t_pair):
        ta, tb = t_pair
        h = (tb - ta) / steps_per_frame

        def sub(x, i):
            x_next, _ = rk_step(f, params, ta + i * h, h, x, tableau)
            return x_next, None

        x_next, _ = jax.lax.scan(
            sub, x, jnp.arange(steps_per_frame, dtype=jnp.result_type(float))
        )
        return x_next, x_next

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    _, frames = jax.lax.scan(frame, x0, t_pairs)
    # Prepend the initial state as the first frame.
    return jax.tree_util.tree_map(
        lambda x0l, fl: jnp.concatenate([x0l[None], fl], axis=0), x0, frames
    )
