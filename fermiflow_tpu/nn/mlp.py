"""One-hidden-layer scalar MLP over a parameter pytree.

Capability parity with reference ``src/MLP.py`` (sigmoid MLP with hand-coded
input gradient, zero and seeded-Gaussian inits).  The analytic ``mlp_grad``
(reference ``src/MLP.py:37-45``) is kept: it feeds the backflow's analytic
divergence, which is exact and far cheaper inside the ODE hot loop than a
generic autodiff divergence.  Parameters are a plain dict pytree — no module
objects, so the whole model state jits/shards/checkpoints as data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "mlp_init_zeros",
    "mlp_init_gaussian",
    "mlp_apply",
    "mlp_grad",
    "mlp_derivs3",
]


def mlp_init_zeros(d_in: int, d_hidden: int, dtype=jnp.float64) -> dict:
    """All-zero init: the induced flow starts as the identity (reference
    ``src/MLP.py:18-21``; both drivers rely on this, ``src/FermionHO2D.py:40``)."""
    return {
        "w1": jnp.zeros((d_in, d_hidden), dtype=dtype),
        "b1": jnp.zeros((d_hidden,), dtype=dtype),
        "w2": jnp.zeros((d_hidden, 1), dtype=dtype),
    }


def mlp_init_gaussian(
    key: jax.Array, d_in: int, d_hidden: int, std: float = 1e-3, dtype=jnp.float64
) -> dict:
    """Seeded Gaussian init, std=1e-3 (reference ``src/MLP.py:23-28``)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w1": std * jax.random.normal(k1, (d_in, d_hidden), dtype=dtype),
        "b1": std * jax.random.normal(k2, (d_hidden,), dtype=dtype),
        "w2": std * jax.random.normal(k3, (d_hidden, 1), dtype=dtype),
    }


_HI = jax.lax.Precision.HIGHEST  # TPU matmuls default to bf16; these tiny
# contractions are precision-critical (they sit inside 2nd-order derivatives).


def mlp_apply(params: dict, x: jax.Array) -> jax.Array:
    """(..., d_in) -> (..., 1): w2 . sigmoid(x w1 + b1)."""
    h = jax.nn.sigmoid(
        jnp.matmul(x, params["w1"], precision=_HI) + params["b1"]
    )
    return jnp.matmul(h, params["w2"], precision=_HI)


def mlp_derivs3(params: dict, r: jax.Array):
    """Value and first three derivatives of the SCALAR-input MLP.

    For the d_in=1 networks (eta, mu) used by the backflow field: with hidden
    pre-activations z = w1 r + b1 and s = sigmoid(z),

        y      = s . w2
        y'     = (w1    sigma' ) . w2,   sigma'   = s(1-s)
        y''    = (w1^2  sigma'') . w2,   sigma''  = sigma'(1-2s)
        y'''   = (w1^3  sigma''') . w2,  sigma''' = sigma'(1-2s)^2 - 2 sigma'^2

    Feeds the closed-form field-derivative tensors of the Hessian-flow local
    energy (the analytic analog, two orders deeper, of reference
    ``src/MLP.py:37-45``).

    Args:
      params: {"w1": (1, h), "b1": (h,), "w2": (h, 1)}.
      r: (...,) scalar inputs (NO trailing feature axis).

    Returns:
      (y, y1, y2, y3), each shaped like ``r``.
    """
    w1 = params["w1"][0]  # (h,)
    w2 = params["w2"][:, 0]  # (h,)
    z = r[..., None] * w1 + params["b1"]
    s = jax.nn.sigmoid(z)
    s1 = s * (1.0 - s)
    s2 = s1 * (1.0 - 2.0 * s)
    s3 = s1 * (1.0 - 2.0 * s) ** 2 - 2.0 * s1 * s1

    def contract(sk, k):
        return jnp.matmul(sk * (w1**k), w2, precision=_HI)

    return (
        jnp.matmul(s, w2, precision=_HI),
        contract(s1, 1),
        contract(s2, 2),
        contract(s3, 3),
    )


def mlp_grad(params: dict, x: jax.Array) -> jax.Array:
    """Analytic d(mlp)/dx: (..., d_in) -> (..., d_in).

    grad = (w2 * s(1-s)) w1ᵀ with s the hidden activations — closed form of
    reference ``src/MLP.py:37-45``, valid for any batch shape.
    """
    s = jax.nn.sigmoid(
        jnp.matmul(x, params["w1"], precision=_HI) + params["b1"]
    )
    return jnp.matmul(
        s * (1.0 - s) * params["w2"][:, 0], params["w1"].T, precision=_HI
    )
