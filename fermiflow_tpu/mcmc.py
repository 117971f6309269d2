"""Metropolis random-walk sampler as a ``lax.scan`` kernel.

Capability parity with the reference's samplers (``src/base_dist.py:58-71``
and ``:102-134``): Gaussian-initialized random walk, per-walker masked
accept/reject.  TPU-native differences:

  * The step loop is a ``lax.scan`` compiled into the surrounding jit — no
    host round-trips per step (the reference runs a Python loop with an
    implicit device sync every iteration).
  * Explicit ``jax.random`` keys: runs are reproducible; per-shard key folding
    makes the sampler deterministic under walker sharding.
  * Acceptance statistics are returned (the reference never records them) and
    drive optional per-walker step-size adaptation toward a target acceptance
    rate — the reference uses a fixed tau = 0.1 with 100 re-equilibration
    steps every iteration, which is kept as the compatibility default.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["MCMCState", "metropolis", "adapt_tau"]


class MCMCState(NamedTuple):
    """Persistent walker state carried across training iterations."""

    x: jax.Array  # (batch, n, dim) walker positions
    logp: jax.Array  # (batch,) log-probabilities at x
    tau: jax.Array  # scalar or (batch,) proposal step size(s)
    accept_rate: jax.Array  # (batch,) acceptance rate of the last run


def metropolis(
    log_prob_fn: Callable[[jax.Array], jax.Array],
    key: jax.Array,
    x0: jax.Array,
    steps: int,
    tau,
) -> MCMCState:
    """Run ``steps`` Metropolis steps from ``x0``.

    Args:
      log_prob_fn: batched log-probability, (batch, n, dim) -> (batch,).
      key: PRNG key.
      x0: (batch, n, dim) initial walker positions.
      steps: number of Metropolis steps (static).
      tau: proposal scale, scalar or (batch,) per-walker.

    Returns:
      MCMCState with final positions, log-probs, tau, and per-walker
      acceptance rates over the run.
    """
    tau = jnp.asarray(tau, dtype=x0.dtype)
    logp0 = log_prob_fn(x0)
    tau_b = tau[..., None, None] if tau.ndim == 1 else tau

    def step(carry, key):
        x, logp, n_acc = carry
        k_prop, k_acc = jax.random.split(key)
        x_new = x + tau_b * jax.random.normal(k_prop, x.shape, dtype=x.dtype)
        logp_new = log_prob_fn(x_new)
        # Accept with probability min(1, exp(logp_new - logp)).
        u = jax.random.uniform(k_acc, logp.shape, dtype=logp.dtype)
        accept = u < jnp.exp(logp_new - logp)
        x = jnp.where(accept[..., None, None], x_new, x)
        logp = jnp.where(accept, logp_new, logp)
        return (x, logp, n_acc + accept.astype(logp.dtype)), None

    keys = jax.random.split(key, steps)
    (x, logp, n_acc), _ = jax.lax.scan(step, (x0, logp0, jnp.zeros_like(logp0)), keys)
    return MCMCState(x=x, logp=logp, tau=tau, accept_rate=n_acc / steps)


def adapt_tau(state: MCMCState, target: float = 0.5, gain: float = 0.1) -> jax.Array:
    """Per-walker (or global) log-space step-size adaptation.

    tau <- tau * exp(gain * (accept_rate - target)).  With per-walker tau this
    is embarrassingly parallel and shards with the walkers; with scalar tau the
    caller should mean-reduce accept_rate first (a ``pmean`` under sharding).
    """
    rate = state.accept_rate
    if state.tau.ndim == 0:
        rate = jnp.mean(rate)
    return state.tau * jnp.exp(gain * (rate - target))
