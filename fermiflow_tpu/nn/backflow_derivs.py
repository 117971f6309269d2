"""Closed-form derivative tensors of the backflow velocity field.

The Hessian-flow local energy (``fermiflow_tpu/vmc/hessian_flow.py``) evolves
the score g = grad logp and Hessian H = grad^2 logp ALONG the generative ODE.
Its right-hand side needs, at each Runge-Kutta stage:

    v       (n, dim)        the field itself
    div v   scalar          instantaneous log-density change
    A       (nd, nd)        A[(i,a),(k,b)] = d v_{ia} / d x_{kb}
    gdiv    (nd,)           grad(div v)
    S       (nd, nd)        grad^2(div v)
    T       (nd, nd)        T_ab = g_c * d^2 v_c / (dx_a dx_b)

All six are assembled here in closed form from the pair structure of the
field  v_i = sum_{j!=i} eta(r_ij)(x_i - x_j) + mu(|x_i|) x_i  and the
analytic derivatives of the scalar MLPs eta/mu up to third order
(``mlp_derivs3``) — no autodiff in the hot loop.  This extends the
reference's hand-derived analytic divergence (``src/equivariant_funs.py:
33-50,66-81``) two derivative orders deeper; everything is verified against
autodiff oracles in ``tests/test_hessian_flow.py``.

Derivation sketch (u = x_i - x_j, r = |u|, all per ordered pair):
    P_a(u)        = eta u_a                                (pair term of v_i)
    dP_a/du_b     = eta' u_a u_b / r + eta d_ab
    d2P_a/du_b du_c = (eta'/r)(d_ab u_c + d_ac u_b + d_bc u_a)
                      + (eta''/r^2 - eta'/r^3) u_a u_b u_c
    phi(r)        = eta' r + dim eta                       (pair term of div)
    phi'          = eta'' r + (dim+1) eta'
    phi''         = eta''' r + (dim+2) eta''
with d/dx_i = +d/du and d/dx_j = -d/du; the one-body term mu(|x|) x has the
identical functional form with u -> x_i, eta -> mu.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fermiflow_tpu.nn.mlp import mlp_derivs3

__all__ = ["backflow_field_tensors"]


def _pair_block_matrix(K: jax.Array, eye_n: jax.Array) -> jax.Array:
    """Assemble the (..., n, dim, n, dim) block matrix with off-diagonal
    blocks -K[i, j] and diagonal blocks sum_j K[i, j].

    This is the common index pattern of A, S, and T: every ordered pair
    (i, j) contributes +K to the (i, i) block and -K to the (i, j) block
    (the d/dx_i = +d/du, d/dx_j = -d/du sign structure).
    """
    off = -jnp.moveaxis(K, -2, -3)  # (..., i, b, j, c)
    diag = jnp.sum(K, axis=-3)  # (..., i, b, c)
    return off + jnp.einsum("...iab,ik->...iakb", diag, eye_n)


def backflow_field_tensors(params: dict, x: jax.Array, g: jax.Array) -> dict:
    """All field-derivative tensors needed by the Hessian-flow RHS.

    Args:
      params: {"eta": mlp, "mu": mlp | None} backflow parameters.
      x: (..., n, dim) positions.
      g: (..., n, dim) current score grad logp (contracted into T).

    Returns:
      dict with v (..., n, dim); div (...,); gdiv (..., nd);
      A, S, T (..., nd, nd)  [nd = n * dim].
    """
    n, dim = x.shape[-2:]
    nd = n * dim
    batch_shape = x.shape[:-2]
    eye_n = jnp.eye(n, dtype=x.dtype)

    # ---- pair geometry (identity-offset-safe diagonal, masked) ----
    u = x[..., :, None, :] - x[..., None, :, :]  # (..., n, n, dim), zero diag
    u_safe = u + eye_n[:, :, None]
    r = jnp.linalg.norm(u_safe, axis=-1)  # (..., n, n)
    inv_r = 1.0 / r
    mask = 1.0 - eye_n

    e0, e1, e2, e3 = mlp_derivs3(params["eta"], r)
    e0, e1, e2, e3 = e0 * mask, e1 * mask, e2 * mask, e3 * mask

    uu = u[..., :, None] * u[..., None, :]  # (..., n, n, dim, dim)
    I_d = jnp.eye(dim, dtype=x.dtype)

    # v and div v (same closed forms as backflow_apply / backflow_divergence).
    v = jnp.sum(e0[..., None] * u, axis=-2)
    div = jnp.sum(e1 * r + dim * e0, axis=(-2, -1))

    # A blocks: dP/du = e1 uu/r + e0 I.
    Puv = (e1 * inv_r)[..., None, None] * uu + e0[..., None, None] * I_d
    A = _pair_block_matrix(Puv, eye_n)

    # grad(div): per pair phi'(r) u / r, ordered pairs double the count.
    phi1 = e2 * r + (dim + 1) * e1
    phi2 = e3 * r + (dim + 2) * e2
    gdiv = jnp.sum(2.0 * (phi1 * inv_r)[..., None] * u, axis=-2)

    # grad^2(div): per pair Phi = phi'' uu/r^2 + phi' (I/r - uu/r^3); the
    # ordered-pair double count makes the block contribution 2 Phi.
    Phi = (phi2 * inv_r**2)[..., None, None] * uu + phi1[..., None, None] * (
        inv_r[..., None, None] * I_d - (inv_r**3)[..., None, None] * uu
    )
    S = _pair_block_matrix(2.0 * Phi, eye_n)

    # T = g_c d2 v_c: per ordered pair (i, j) the contraction of d2P with g_i,
    #   Gq_bc = (e1/r)(g_b u_c + g_c u_b + d_bc g.u) + (e2/r^2 - e1/r^3)(g.u) uu
    # and the (j, i) pair contributes the transpose-pair term, so the block
    # kernel is M_ij = Gq_ij + Gq_ji.
    gi = g[..., :, None, :]  # g_i broadcast over j
    gu = jnp.sum(gi * u, axis=-1)  # (..., n, n)
    g_sym = gi[..., :, None] * u[..., None, :]
    g_sym = g_sym + jnp.swapaxes(g_sym, -1, -2)
    qa = e1 * inv_r
    qb = (e2 * inv_r**2 - e1 * inv_r**3) * gu
    Gq = qa[..., None, None] * (g_sym + gu[..., None, None] * I_d) + qb[
        ..., None, None
    ] * uu
    M = Gq + jnp.swapaxes(Gq, -4, -3)
    T = _pair_block_matrix(M, eye_n)

    # ---- one-body term mu(|x|) x: same algebra with u -> x_i ----
    if params.get("mu") is not None:
        rho = jnp.linalg.norm(x, axis=-1)  # (..., n)
        inv_rho = 1.0 / rho
        m0, m1, m2, m3 = mlp_derivs3(params["mu"], rho)
        xx = x[..., :, None] * x[..., None, :]  # (..., n, dim, dim)

        v = v + m0[..., None] * x
        div = div + jnp.sum(m1 * rho + dim * m0, axis=-1)

        A1 = (m1 * inv_rho)[..., None, None] * xx + m0[..., None, None] * I_d
        psi1 = m2 * rho + (dim + 1) * m1
        psi2 = m3 * rho + (dim + 2) * m2
        gdiv = gdiv + (psi1 * inv_rho)[..., None] * x
        S1 = (psi2 * inv_rho**2)[..., None, None] * xx + psi1[
            ..., None, None
        ] * (inv_rho[..., None, None] * I_d - (inv_rho**3)[..., None, None] * xx)
        gx = jnp.sum(g * x, axis=-1)  # (..., n)
        gx_sym = g[..., :, None] * x[..., None, :]
        gx_sym = gx_sym + jnp.swapaxes(gx_sym, -1, -2)
        Gq1 = (m1 * inv_rho)[..., None, None] * (
            gx_sym + gx[..., None, None] * I_d
        ) + ((m2 * inv_rho**2 - m1 * inv_rho**3) * gx)[..., None, None] * xx

        A = A + jnp.einsum("...iab,ik->...iakb", A1, eye_n)
        S = S + jnp.einsum("...iab,ik->...iakb", S1, eye_n)
        T = T + jnp.einsum("...iab,ik->...iakb", Gq1, eye_n)

    flat = batch_shape + (nd, nd)
    return {
        "v": v,
        "div": div,
        "gdiv": gdiv.reshape(batch_shape + (nd,)),
        "A": A.reshape(flat),
        "S": S.reshape(flat),
        "T": T.reshape(flat),
    }
