"""Slater-determinant primitives, batched the XLA way.

Capability parity with the reference's ``src/slater.py`` (LogAbsSlaterDet,
LogAbsSlaterDetMultStates and their autograd-through-slogdet cross-check
variants), re-designed for TPU:

  * The reference builds the Slater matrix one orbital-column at a time in a
    Python loop (``src/slater.py:28-31``) and, for mixed states, loops over a
    host-side ``Counter`` of contiguous per-state batch segments
    (``src/slater.py:107-120``).  Here the matrix is built in one shot from the
    batched orbital evaluation, and the mixed-state case uses a dense
    ``(batch,)`` int array of state indices combined with one-hot matmuls — a
    single identically-shaped batched computation that shards cleanly over a
    walker mesh axis (no ragged groups, no host loops).
  * The reference hand-codes a structure-exploiting backward
    (∇log|det| = φ'ᵀ D⁻ᵀ, ``src/slater.py:45-62``) because generic autograd
    through torch.slogdet was deemed less stable.  JAX's ``slogdet`` JVP/VJP is
    itself written in terms of LU solves and differentiates to higher order;
    we rely on it (validated by the eigenstate tests to float64 accuracy) and
    keep the door open for a Pallas batched small-n kernel on the hot path.

All functions are pure, jit/vmap/grad-compatible to arbitrary order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fermiflow_tpu.ops.logdet import logabsdet
from fermiflow_tpu.physics.orbitals import HO2D, hermite_functions

__all__ = [
    "slater_matrix",
    "log_abs_slater_det",
    "slater_matrix_multstates",
    "log_abs_slater_det_multstates",
]


def slater_matrix(orbitals: HO2D, occ, x: jax.Array) -> jax.Array:
    """Slater matrix D[..., i, j] = phi_{occ[j]}(r_i) for a STATIC orbital set.

    Args:
      orbitals: the orbital family.
      occ: static sequence of occupied orbital indices, length n.
      x: (..., n, dim) particle coordinates.

    Returns:
      (..., n, n) Slater matrices.
    """
    occ = np.asarray(occ, dtype=np.int32)
    n = x.shape[-2]
    if len(occ) != n:
        raise ValueError(f"need {n} orbitals for {n} particles, got {len(occ)}")
    # (..., n, n_occ): all occupied orbitals at every particle position.
    return orbitals.eval_orbitals(occ, x)


def log_abs_slater_det(orbitals: HO2D, occ, x: jax.Array) -> jax.Array:
    """log|det D| with D the Slater matrix of a static orbital set.

    Capability of reference ``LogAbsSlaterDet.apply`` / ``logabsslaterdet``
    (``src/slater.py:4-74``).  Shape: x (..., n, dim) -> (...,).
    """
    D = slater_matrix(orbitals, occ, x)
    # Unrolled Gaussian elimination, not jnp.linalg.slogdet: the LU custom
    # call dominates the whole training step at this tiny-n/huge-batch shape
    # (see fermiflow_tpu/ops/logdet.py).
    return logabsdet(D)


def slater_matrix_multstates(
    orbitals: HO2D,
    occ_table: jax.Array,
    state_idx: jax.Array,
    x: jax.Array,
) -> jax.Array:
    """Per-walker Slater matrices for per-walker orbital occupations.

    Capability of reference ``LogAbsSlaterDetMultStates``
    (``src/slater.py:76-155``) without the Counter-of-contiguous-segments host
    machinery: every walker carries its own state index, and the orbital
    columns are selected with one-hot matmuls (MXU-friendly, gather-free on
    the position axis, identical shape for every walker — shards trivially).

    Args:
      orbitals: the orbital family.
      occ_table: (Nstates, n) int array of occupied orbital indices per state.
      state_idx: (batch,) int array, which state each walker is in.
      x: (batch, n, dim) coordinates.

    Returns:
      (batch, n, n) Slater matrices D[b, i, j] = phi_{occ_table[state_idx[b], j]}(x[b, i]).
    """
    K = orbitals.num_shells
    nx_tab = jnp.asarray(orbitals.nx)
    ny_tab = jnp.asarray(orbitals.ny)

    occ = jnp.take(occ_table, state_idx, axis=0)  # (batch, n)
    nx_occ = jnp.take(nx_tab, occ)  # (batch, n)
    ny_occ = jnp.take(ny_tab, occ)  # (batch, n)

    gauss = jnp.exp(-0.5 * jnp.sum(x**2, axis=-1)) * float(1 / np.sqrt(np.pi))
    hx = hermite_functions(x[..., 0], K)  # (batch, n, K)
    hy = hermite_functions(x[..., 1], K)  # (batch, n, K)

    dtype = x.dtype
    oh_x = jax.nn.one_hot(nx_occ, K, dtype=dtype)  # (batch, n, K)
    oh_y = jax.nn.one_hot(ny_occ, K, dtype=dtype)
    # D_x[b, i, j] = hx[b, i, nx_occ[b, j]]  (and likewise for y)
    hi = jax.lax.Precision.HIGHEST  # bf16 MXU default would corrupt the
    # determinants that everything downstream differentiates twice
    D_x = jnp.einsum("...ik,...jk->...ij", hx, oh_x, precision=hi)
    D_y = jnp.einsum("...ik,...jk->...ij", hy, oh_y, precision=hi)
    return gauss[..., :, None] * D_x * D_y


def log_abs_slater_det_multstates(
    orbitals: HO2D,
    occ_table: jax.Array,
    state_idx: jax.Array,
    x: jax.Array,
) -> jax.Array:
    """log|det D| per walker for per-walker states -> (batch,)."""
    D = slater_matrix_multstates(orbitals, occ_table, state_idx, x)
    return logabsdet(D)
