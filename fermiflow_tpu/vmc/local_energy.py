"""Batched value/gradient/Laplacian engine for local-energy estimation.

This replaces the single hottest construct in the reference: a Python loop of
2n·dim sequential ``autograd.grad`` calls, one per coordinate, each of which
re-traverses the full reverse-ODE adjoint graph (``src/utils.py:40-65``,
called from ``src/VMC.py:48,134``).  Here the Laplacian is one batched
forward-over-reverse pass:

    per walker:  g = grad(f),  H = jacfwd(g),  lap = tr(H)

vmapped over walkers and fused by XLA into a single compiled region — the
2n·dim tangent solves run as one batched computation instead of a host-driven
sequential loop.  Requires the inner function to be differentiable in both
modes, which the scan-based fixed-grid ODE solver is (this is why the
likelihood path does NOT use the custom_vjp adjoint — JAX defines no
forward-mode rule for custom_vjp).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["y_grad_laplacian", "divergence_fwd"]


def y_grad_laplacian(
    f_single: Callable,
    x: jax.Array,
    *args,
    chunk_size: int | None = None,
    mode: str = "fwdfwd",
):
    """Value, gradient and Laplacian of a per-walker scalar function.

    Args:
      f_single: (xs, *a) -> scalar, xs of shape (n, dim).
      x: (batch, n, dim) walker positions.
      *args: optional extra per-walker arrays (leading batch axis), e.g. the
        finite-temperature per-walker state index.
      chunk_size: if set, process the batch in sequential chunks of this size
        (``lax.map``), bounding live memory by the chunk.  batch must be
        divisible by chunk_size.
      mode: "fwdfwd" (default) — nested-jvp second-order FORWARD mode: for
        each of the 2n·dim basis directions, one second-order directional
        derivative.  Pure forward differentiation never stacks per-scan-step
        residuals, so memory through the reverse-ODE logp is O(live
        activations · d), not O(ode_steps · d) — the difference between
        fitting in HBM and a 40 GB OOM at production batch sizes.
        "fwdrev" — forward-over-reverse Hessian (jacfwd of grad), kept as a
        cross-check; requires f reverse-differentiable.

    Returns:
      (y, grad_y, lap_y) with shapes (batch,), (batch, n, dim), (batch,).
    """
    n, dim = x.shape[-2:]
    d = n * dim

    def single_fwdfwd(xs, *a):
        xf = xs.reshape(d)

        def f_flat(v):
            return f_single(v.reshape(n, dim), *a)

        eye = jnp.eye(d, dtype=xs.dtype)

        def dir2(e):
            # First jvp: directional derivative g_e = ∇f·e; second jvp of
            # that along e gives the diagonal Hessian element eᵀHe.
            g_fn = lambda v: jax.jvp(f_flat, (v,), (e,))[1]
            g_e, h_ee = jax.jvp(g_fn, (xf,), (e,))
            return g_e, h_ee

        g, hdiag = jax.vmap(dir2)(eye)
        return f_flat(xf), g.reshape(n, dim), jnp.sum(hdiag)

    def single_fwdrev(xs, *a):
        xf = xs.reshape(d)

        def f_flat(v):
            return f_single(v.reshape(n, dim), *a)

        y, g = jax.value_and_grad(f_flat)(xf)
        H = jax.jacfwd(jax.grad(f_flat))(xf)
        return y, g.reshape(n, dim), jnp.trace(H)

    batched = jax.vmap(single_fwdfwd if mode == "fwdfwd" else single_fwdrev)
    batch = x.shape[0]
    if chunk_size is None or batch <= chunk_size:
        return batched(x, *args)
    if batch % chunk_size:
        raise ValueError(f"batch {batch} not divisible by chunk {chunk_size}")
    nchunk = batch // chunk_size

    def reshape_in(a):
        return a.reshape((nchunk, chunk_size) + a.shape[1:])

    xs = reshape_in(x)
    args_r = tuple(reshape_in(a) for a in args)
    y, g, lap = jax.lax.map(lambda c: batched(c[0], *c[1:]), (xs,) + args_r)
    return (
        y.reshape(batch),
        g.reshape(batch, n, dim),
        lap.reshape(batch),
    )


def divergence_fwd(v_single: Callable, x: jax.Array, *args):
    """Divergence of a vector field by forward-mode autodiff (cross-check
    utility, capability of reference ``src/utils.py:4-38``).

    Args:
      v_single: (xs, *a) -> (n, dim) vector field on a single walker.
      x: (batch, n, dim).

    Returns:
      (batch,) divergence tr(∂v/∂x).
    """
    n, dim = x.shape[-2:]
    d = n * dim

    def single(xs, *a):
        def v_flat(vf):
            return v_single(vf.reshape(n, dim), *a).reshape(d)

        J = jax.jacfwd(v_flat)(xs.reshape(d))
        return jnp.trace(J)

    return jax.vmap(single)(x, *args)
