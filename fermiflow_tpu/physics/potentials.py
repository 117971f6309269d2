"""Trap and interaction potentials.

Capability parity with reference ``src/potentials.py`` (HO single-particle
trap, Coulomb pair potential), re-designed for XLA: the reference gathers the
upper-triangular pairs with ``triu_indices`` (``src/potentials.py:23-31``);
gathers are TPU-hostile, so we sum the full masked (n, n) pair matrix instead
(same FLOP count at these n, no gather, vectorizes on the VPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pairwise_distances", "HOPotential", "CoulombPairPotential"]


def pairwise_distances(x: jax.Array):
    """All-pairs distances with a differentiation-safe diagonal.

    Args:
      x: (..., n, dim).

    Returns:
      dij: (..., n, n) distances; the diagonal holds a dummy value of 1
        (the identity offset keeps the norm's gradient finite at rij = 0,
        same trick as reference ``src/equivariant_funs.py:27``).
      mask: (..., n, n) 1.0 off-diagonal, 0.0 on the diagonal.
    """
    n = x.shape[-2]
    rij = x[..., :, None, :] - x[..., None, :, :]
    eye = jnp.eye(n, dtype=x.dtype)
    rij_safe = rij + eye[..., :, :, None]
    dij = jnp.linalg.norm(rij_safe, axis=-1)
    mask = 1.0 - eye
    return dij, mask


class HOPotential:
    """Harmonic trap V = 1/2 sum_i r_i² (reference ``src/potentials.py:9-14``)."""

    def V(self, x: jax.Array) -> jax.Array:
        return 0.5 * jnp.sum(x**2, axis=(-2, -1))

    def V_rows(self, xd: jax.Array, n: int, dim: int) -> jax.Array:
        """Row-major variant: xd (n*dim, B), rows = flattened coordinates.

        Used by the tile-chained Pallas local-energy path (vmc/gs.py): the
        kernel tile block reshapes to (d, B) without any transpose, so the
        potential is the only XLA stage and must not force a relayout."""
        return 0.5 * jnp.sum(xd * xd, axis=0)

    __call__ = V


class CoulombPairPotential:
    """V = sum_{i<j} Z / |r_i - r_j| (reference ``src/potentials.py:17-47``)."""

    def __init__(self, Z: float):
        self.Z = Z

    def V(self, x: jax.Array) -> jax.Array:
        dij, mask = pairwise_distances(x)
        # 0.5 * sum over ordered pairs == sum over i<j.
        return 0.5 * self.Z * jnp.sum(mask / dij, axis=(-2, -1))

    def V_rows(self, xd: jax.Array, n: int, dim: int) -> jax.Array:
        """Row-major variant (see ``HOPotential.V_rows``): unrolled i<j pair
        sum over coordinate rows — no (n, n) matrix, no diagonal masking."""
        V = jnp.zeros(xd.shape[-1], xd.dtype)
        for i in range(n):
            for j in range(i + 1, n):
                r2 = sum(
                    (xd[i * dim + a] - xd[j * dim + a]) ** 2
                    for a in range(dim)
                )
                V = V + self.Z / jnp.sqrt(r2)
        return V

    __call__ = V
