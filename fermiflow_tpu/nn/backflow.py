"""Permutation-equivariant backflow velocity field with analytic divergence.

Capability parity with reference ``src/equivariant_funs.py`` (Backflow: two-body
xi^{e-e}, optional one-body xi^{e-n}, hand-derived divergences), TPU-native:

  * Two-body part: xi_i = sum_{j != i} eta(|r_i - r_j|)(r_i - r_j).  The
    reference handles the diagonal singularity by adding eye(n) to rij and then
    subtracting the spurious eta(sqrt(dim)) constant
    (``src/equivariant_funs.py:27-30``).  We instead mask the diagonal
    explicitly — exact, no correction term, equally NaN-safe under
    differentiation (the identity offset keeps |r_ii| > 0).
  * Divergence: div = sum_{i != j}(eta' d + dim eta) + sum_i(mu' d + dim mu),
    computed over the full masked (n, n) pair matrix — no ``triu_indices``
    gathers (TPU-hostile); same closed form as the reference
    (``src/equivariant_funs.py:33-50,66-81``), using the MLP's analytic grad.
  * Works on any batch shape (the functions touch only the last two axes), so
    a single definition serves the batched training path and the per-walker
    path inside the Laplacian engine via ``vmap``.

Parameters: ``{"eta": mlp_params, "mu": mlp_params | None}``.  ``mu=None``
(reference ``--nomu``) is a static pytree-structure choice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fermiflow_tpu.nn.mlp import (
    mlp_apply,
    mlp_grad,
    mlp_init_gaussian,
    mlp_init_zeros,
)

__all__ = [
    "backflow_init_zeros",
    "backflow_init_gaussian",
    "backflow_apply",
    "backflow_divergence",
]


def backflow_init_zeros(
    d_eta: int, d_mu: int | None = None, dtype=jnp.float64
) -> dict:
    """Identity-flow init (both reference drivers use this)."""
    return {
        "eta": mlp_init_zeros(1, d_eta, dtype=dtype),
        "mu": None if d_mu is None else mlp_init_zeros(1, d_mu, dtype=dtype),
    }


def backflow_init_gaussian(
    key: jax.Array,
    d_eta: int,
    d_mu: int | None = None,
    std: float = 1e-3,
    dtype=jnp.float64,
) -> dict:
    k_eta, k_mu = jax.random.split(key)
    return {
        "eta": mlp_init_gaussian(k_eta, 1, d_eta, std=std, dtype=dtype),
        "mu": None
        if d_mu is None
        else mlp_init_gaussian(k_mu, 1, d_mu, std=std, dtype=dtype),
    }


def _pair_geometry(x: jax.Array):
    """rij with identity-offset-safe diagonal, distances, off-diagonal mask."""
    n = x.shape[-2]
    rij = x[..., :, None, :] - x[..., None, :, :]
    eye = jnp.eye(n, dtype=x.dtype)
    rij_safe = rij + eye[..., :, :, None]
    dij = jnp.linalg.norm(rij_safe, axis=-1, keepdims=True)  # (..., n, n, 1)
    return rij_safe, dij, eye


def backflow_apply(params: dict, x: jax.Array) -> jax.Array:
    """Velocity v(x): (..., n, dim) -> (..., n, dim)."""
    rij_safe, dij, eye = _pair_geometry(x)
    mask = (1.0 - eye)[..., :, :, None]
    v = jnp.sum(mask * mlp_apply(params["eta"], dij) * rij_safe, axis=-2)
    if params["mu"] is not None:
        di = jnp.linalg.norm(x, axis=-1, keepdims=True)
        v = v + mlp_apply(params["mu"], di) * x
    return v


def backflow_divergence(params: dict, x: jax.Array) -> jax.Array:
    """Analytic div v: (..., n, dim) -> (...,)."""
    dim = x.shape[-1]
    _, dij, eye = _pair_geometry(x)
    mask = (1.0 - eye)[..., :, :, None]
    eta = mlp_apply(params["eta"], dij)
    d_eta = mlp_grad(params["eta"], dij)
    div = jnp.sum(mask * (d_eta * dij + dim * eta), axis=(-3, -2, -1))
    if params["mu"] is not None:
        di = jnp.linalg.norm(x, axis=-1, keepdims=True)
        mu = mlp_apply(params["mu"], di)
        d_mu = mlp_grad(params["mu"], di)
        div = div + jnp.sum(d_mu * di + dim * mu, axis=(-2, -1))
    return div
