"""Continuous normalizing flow over fermion coordinates.

Capability parity with reference ``src/flow.py`` (CNF: generate, delta_logp,
nframes trajectory, check_reversibility, backflow accessor), as pure functions
over a parameter pytree:

  * generate: integrate dx/dt = v(x) forward, z -> x (reference
    ``src/flow.py:42-49``).
  * delta_logp: integrate the coupled (dx/dt, dlogp/dt) = (v(x), -div v(x))
    in REVERSE time from x at t1 back to z at t0, accumulating the log-det
    (reference ``src/flow.py:30-37,51-55``); log p_x(x) = log p_z(z) - delta_logp.
  * The velocity and its analytic divergence are injected as functions, so any
    equivariant field plugs in (the default is the backflow pair field).

Solver selection is per-call-site: the sampling path may use the adaptive
dopri5 (no gradients needed), the likelihood path uses the fixed-grid scan
solver (differentiable to any order, needed by the Laplacian engine), and the
O(1)-memory adjoint is available for parameter gradients on deep integrations.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from fermiflow_tpu.ode import odeint, odeint_adaptive, odeint_adjoint, odeint_trajectory

__all__ = ["CNF"]


@dataclasses.dataclass(frozen=True)
class CNF:
    """Static configuration of the flow; all methods are pure functions.

    Attributes:
      velocity: (params, x) -> v, permutation-equivariant velocity field.
      divergence: (params, x) -> div v, analytic divergence of ``velocity``.
      t0, t1: integration interval (reference defaults 0, 1).
      steps: fixed-grid step count for the differentiable solver.
      method: fixed-grid tableau name.
      solver: "fixed" | "adaptive" | "adjoint" for the generate path.
      rtol, atol: adaptive tolerances (reference parity: 1e-6, 1e-8).
      remat: rematerialize ODE steps in the likelihood backward pass —
        without it the scan stacks per-step pair activations
        (ode_steps x batch x n x n x hidden), which alone overflows HBM at
        production batch sizes; with it the backward recomputes each step.
      field_tensors: optional closed-form derivative-tensor function of the
        velocity field ((params, x, g) -> dict, see nn/backflow_derivs.py).
        When provided, the VMC models can use the Hessian-flow local-energy
        engine (vmc/hessian_flow.py) instead of nested-jvp Laplacians.
    """

    velocity: Callable
    divergence: Callable
    field_tensors: Callable | None = None
    t0: float = 0.0
    t1: float = 1.0
    steps: int = 16
    method: str = "dopri5"
    solver: str = "fixed"
    rtol: float = 1e-6
    atol: float = 1e-8
    remat: bool = True

    # -- generative direction: z -> x --

    def generate(self, params, z: jax.Array) -> jax.Array:
        """Push base samples through the flow (no log-det accounting)."""
        f = lambda p, t, x: self.velocity(p, x)
        if self.solver == "adaptive":
            return odeint_adaptive(
                f, params, z, self.t0, self.t1, rtol=self.rtol, atol=self.atol
            )
        if self.solver == "adjoint":
            return odeint_adjoint(
                f, params, z, self.t0, self.t1, self.steps, self.method
            )
        return odeint(
            f, params, z, self.t0, self.t1, steps=self.steps, method=self.method
        )

    def generate_trajectory(self, params, z: jax.Array, nframes: int) -> jax.Array:
        """Frames of the generative ODE for density movies
        (reference ``src/flow.py:46-48``): (nframes, *z.shape)."""
        f = lambda p, t, x: self.velocity(p, x)
        ts = jnp.linspace(self.t0, self.t1, nframes, dtype=z.dtype)
        return odeint_trajectory(f, params, z, ts, method=self.method)

    # -- likelihood direction: x -> (z, delta_logp) --

    def delta_logp(self, params, x: jax.Array, use_adjoint: bool = False):
        """Reverse-integrate the coupled (x, logdet) system.

        Returns (z, delta_logp) with delta_logp shaped like x without its last
        two axes; log p_x(x) = log p_z(z) - delta_logp.
        """

        def f(p, t, state):
            xt, _ = state
            return (self.velocity(p, xt), -self.divergence(p, xt))

        lp0 = jnp.zeros(x.shape[:-2], dtype=x.dtype)
        if use_adjoint:
            z, delta_logp = odeint_adjoint(
                f, params, (x, lp0), self.t1, self.t0, self.steps, self.method
            )
        else:
            z, delta_logp = odeint(
                f, params, (x, lp0), self.t1, self.t0,
                steps=self.steps, method=self.method, remat=self.remat,
            )
        return z, delta_logp

    # -- diagnostics --

    def check_reversibility(self, params, base_log_prob: Callable, z: jax.Array):
        """Round-trip z -> x -> z diagnostic (reference ``src/flow.py:57-69``).

        Args:
          params: flow parameters.
          base_log_prob: (z) -> log p_z(z), batched.
          z: base-distribution samples.

        Returns:
          dict with max |z_rev - z| and max |logp_rev - logp|.
        """
        x = self.generate(params, z)

        def f(p, t, state):
            xt, _ = state
            return (self.velocity(p, xt), -self.divergence(p, xt))

        _, logp_fwd = odeint(
            f,
            params,
            (z, base_log_prob(z)),
            self.t0,
            self.t1,
            steps=self.steps,
            method=self.method,
        )
        z_rev, dlp = self.delta_logp(params, x)
        logp_rev = base_log_prob(z_rev) - dlp
        return {
            "max_abs_z_err": jnp.max(jnp.abs(z_rev - z)),
            "max_abs_logp_err": jnp.max(jnp.abs(logp_rev - logp_fwd)),
        }
