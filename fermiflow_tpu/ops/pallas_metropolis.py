"""Fused Metropolis chain for the free-fermion base density (Pallas/TPU).

The sampler is the hot loop of every training iteration (reference runs 100
Metropolis steps per iteration, ``src/base_dist.py:58-71``).  The XLA scan
version already replaces the reference's host loop, but still pays per-step
HLO op overhead and threefry RNG.  This kernel runs the ENTIRE chain inside
one ``pallas_call``:

  * walkers live in VMEM for the whole chain, laid out coordinate-major
    ``(n*dim, B)`` so the batch rides the 128-wide vector lanes;
  * proposals come from the on-core PRNG (``pltpu.prng_random_bits``) via
    Box–Muller — no threefry tensor traffic;
  * the Slater log-density (normalized Hermite recurrence + unrolled pivoted
    Gaussian elimination, same math as ``ops/logdet.py``) is evaluated
    entirely in-register per step;
  * accept/reject is a lane-wise select.

Two variants: the spin-polarized single-state case (ground-state sampler,
static occupations unrolled into the kernel) and the mixed-state case
(finite-temperature sampler: each walker carries its own orbital occupation,
streamed into VMEM as per-walker quantum-number arrays and resolved with
masked sums over the Hermite table).  The generic scan sampler remains the
reference implementation and the fallback for CPUs and f64.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "metropolis_free_fermion",
    "metropolis_free_fermion_multistate",
    "metropolis_free_fermion_sharded",
    "metropolis_free_fermion_multistate_sharded",
]

_TWO_PI = 2.0 * math.pi


def _uniform01(shape):
    """f32 uniforms in (0, 1) from raw PRNG bits (24-bit mantissa path)."""
    # bitcast first: raw bits arrive as int32 and an arithmetic shift of
    # negative values would produce garbage uniforms.
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # Mosaic has no uint32 -> f32 cast; after >> 8 the value fits in 24 bits,
    # so a bitcast to int32 (non-negative) casts fine.
    bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = bits24.astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.maximum(u, 1e-12)


def _normals(shape):
    """Standard normals via Box–Muller; shape[0] must be even."""
    half = (shape[0] // 2,) + shape[1:]
    u1 = _uniform01(half)
    u2 = _uniform01(half)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return jnp.concatenate(
        [r * jnp.cos(_TWO_PI * u2), r * jnp.sin(_TWO_PI * u2)], axis=0
    )


def _slater_logp(x, nx_occ, ny_occ, n, dim, num_shells):
    """2 log|det phi_j(r_i)| for coordinate-major x (n*dim, B) -> (1, B).

    nx_occ/ny_occ: static python tuples of the occupied orbitals' 1D quantum
    numbers.  Everything unrolls over the static particle/orbital indices;
    all per-walker values are kept as (1, B) rows — Mosaic's layout engine
    rejects rank-1 arrays.
    """
    B = x.shape[-1]
    K = num_shells

    # Per-particle Hermite tables h_0..h_{K-1} and Gaussian factor.
    pref = float(1.0 / np.sqrt(np.pi))
    hx = []  # hx[i][k] : (1, B)
    hy = []
    gauss = []
    for i in range(n):
        xi = x[i * dim + 0 : i * dim + 1]
        yi = x[i * dim + 1 : i * dim + 2]
        gauss.append(pref * jnp.exp(-0.5 * (xi * xi + yi * yi)))

        def hermites(c):
            hs = [jnp.ones_like(c)]
            if K > 1:
                hs.append(float(np.sqrt(2.0)) * c)
            for m in range(1, K - 1):
                hs.append(
                    float(np.sqrt(2.0 / (m + 1))) * c * hs[m]
                    - float(np.sqrt(m / (m + 1.0))) * hs[m - 1]
                )
            return hs

        hx.append(hermites(xi))
        hy.append(hermites(yi))

    # Slater matrix rows ((1, B) each): D[i][j] = gauss_i * hx_i[nx_j] * hy_i[ny_j].
    D = [
        [gauss[i] * hx[i][nx_occ[j]] * hy[i][ny_occ[j]] for j in range(n)]
        for i in range(n)
    ]

    # Unrolled pivoted Gaussian elimination on the list-of-lanes matrix
    # (same algorithm as ops/logdet.py, scalar-unrolled).
    tiny = 1e-30
    used = [jnp.zeros((1, B), jnp.float32) for _ in range(n)]
    logabs = jnp.zeros((1, B), jnp.float32)
    col_off = 0
    for _step in range(n):
        # Masked argmax over rows of |D[i][col_off]| — tournament of selects.
        best_val = None
        best_idx = None
        for i in range(n):
            cand = jnp.where(used[i] > 0.5, -1.0, jnp.abs(D[i][col_off]))
            if best_val is None:
                best_val, best_idx = cand, jnp.zeros((1, B), jnp.int32)
            else:
                take = cand > best_val
                best_val = jnp.where(take, cand, best_val)
                best_idx = jnp.where(take, i, best_idx)
        # Gather pivot row/value with selects.
        pivot_row = [jnp.zeros((1, B), jnp.float32) for _ in range(n)]
        pivot_val = jnp.zeros((1, B), jnp.float32)
        for i in range(n):
            is_p = best_idx == i
            pivot_val = jnp.where(is_p, D[i][col_off], pivot_val)
            for j in range(col_off, n):
                pivot_row[j] = jnp.where(is_p, D[i][j], pivot_row[j])
        logabs = logabs + jnp.log(jnp.maximum(jnp.abs(pivot_val), tiny))
        safe_p = jnp.where(jnp.abs(pivot_val) > tiny, pivot_val, 1.0)
        for i in range(n):
            is_p = best_idx == i
            remaining = jnp.logical_and(used[i] < 0.5, jnp.logical_not(is_p))
            m = jnp.where(remaining, D[i][col_off] / safe_p, 0.0)
            for j in range(col_off + 1, n):
                D[i][j] = D[i][j] - m * pivot_row[j]
            used[i] = jnp.where(is_p, 1.0, used[i])
        col_off += 1

    return 2.0 * logabs


def _metropolis_kernel(
    seed_ref, x_ref, tau_ref, out_x_ref, out_logp_ref, out_acc_ref,
    *, steps, n, dim, nx_occ, ny_occ, num_shells,
):
    # Independent stream per walker-block program.
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    d = n * dim
    x = x_ref[:]  # (d, B)
    B = x.shape[-1]
    tau = tau_ref[:]  # (1, B)
    logp = _slater_logp(x, nx_occ, ny_occ, n, dim, num_shells)  # (1, B)
    acc = jnp.zeros((1, B), jnp.float32)

    def body(_, carry):
        x, logp, acc = carry
        noise = _normals((d, B))
        x_new = x + tau * noise
        logp_new = _slater_logp(x_new, nx_occ, ny_occ, n, dim, num_shells)
        u = _uniform01((1, B))
        accept = u < jnp.exp(jnp.minimum(logp_new - logp, 0.0))  # (1, B)
        x = jnp.where(accept, x_new, x)  # broadcasts over rows
        logp = jnp.where(accept, logp_new, logp)
        return x, logp, acc + accept.astype(jnp.float32)

    x, logp, acc = jax.lax.fori_loop(0, steps, body, (x, logp, acc))
    out_x_ref[:] = x
    out_logp_ref[:] = logp
    out_acc_ref[:] = acc / max(steps, 1)


@functools.partial(
    jax.jit, static_argnames=("steps", "nx_occ", "ny_occ", "num_shells", "interpret")
)
def metropolis_free_fermion(
    x0: jax.Array,
    seed: jax.Array,
    tau: jax.Array,
    steps: int,
    nx_occ: tuple,
    ny_occ: tuple,
    num_shells: int = 8,
    interpret: bool = False,
):
    """Run a fused Metropolis chain on the Slater base density.

    Args:
      x0: (B, n, dim) float32 initial walker positions; B a multiple of 128.
      seed: int32 scalar PRNG seed.
      tau: scalar or (B,) proposal step size(s).
      steps: number of Metropolis steps (static).
      nx_occ, ny_occ: static tuples of the occupied orbitals' 1D quantum
        numbers (length n).
      num_shells: Hermite recurrence depth.
      interpret: run in Pallas interpreter mode (CPU testing).

    Returns:
      (x, logp, accept_rate): (B, n, dim), (B,), (B,).
    """
    B, n, dim = x0.shape
    d = n * dim
    # Walker-block grid: the fully unrolled chain body keeps O(n^2 + n*K)
    # (1, BW) rows live, so the whole batch at once blows the 16M VMEM
    # budget; each program runs the complete chain for its block.
    BW = min(B, 512)
    if B % BW:
        raise ValueError(f"batch {B} must be a multiple of {BW}")
    x_cm = x0.reshape(B, d).T.astype(jnp.float32)  # (d, B) coordinate-major
    tau_b = jnp.broadcast_to(jnp.asarray(tau, jnp.float32), (B,))[None, :]
    seed_arr = jnp.asarray([seed], jnp.int32)

    kernel = functools.partial(
        _metropolis_kernel,
        steps=steps,
        n=n,
        dim=dim,
        nx_occ=tuple(nx_occ),
        ny_occ=tuple(ny_occ),
        num_shells=num_shells,
    )
    grid = (B // BW,)
    row_block = lambda rows: pl.BlockSpec(
        (rows, BW), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    x_out, logp, acc = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((d, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_block(d),
            row_block(1),
        ],
        out_specs=(row_block(d), row_block(1), row_block(1)),
        # TPU-flavored interpreter (plain interpret=True lacks the pltpu
        # PRNG primitives on CPU).
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, x_cm, tau_b)
    return x_out.T.reshape(B, n, dim), logp[0], acc[0]


# ---- mixed-state (finite-temperature) variant ----


def _hermite_tables(x, n, dim, num_shells):
    """Per-particle Hermite value lists and Gaussian prefactors.

    Returns (gauss, hx, hy) with gauss[i] : (1, B) and hx[i]/hy[i] lists of
    num_shells (1, B) rows.
    """
    pref = float(1.0 / np.sqrt(np.pi))
    K = num_shells
    gauss, hx, hy = [], [], []
    for i in range(n):
        xi = x[i * dim + 0 : i * dim + 1]
        yi = x[i * dim + 1 : i * dim + 2]
        gauss.append(pref * jnp.exp(-0.5 * (xi * xi + yi * yi)))

        def hermites(c):
            hs = [jnp.ones_like(c)]
            if K > 1:
                hs.append(float(np.sqrt(2.0)) * c)
            for m in range(1, K - 1):
                hs.append(
                    float(np.sqrt(2.0 / (m + 1))) * c * hs[m]
                    - float(np.sqrt(m / (m + 1.0))) * hs[m - 1]
                )
            return hs

        hx.append(hermites(xi))
        hy.append(hermites(yi))
    return gauss, hx, hy


def _ge_logabsdet_rows(D, n):
    """Unrolled pivoted GE on a list-of-(1,B)-rows matrix -> 2 log|det|."""
    B = D[0][0].shape[-1]
    tiny = 1e-30
    used = [jnp.zeros((1, B), jnp.float32) for _ in range(n)]
    logabs = jnp.zeros((1, B), jnp.float32)
    col_off = 0
    for _step in range(n):
        best_val = None
        best_idx = None
        for i in range(n):
            cand = jnp.where(used[i] > 0.5, -1.0, jnp.abs(D[i][col_off]))
            if best_val is None:
                best_val, best_idx = cand, jnp.zeros((1, B), jnp.int32)
            else:
                take = cand > best_val
                best_val = jnp.where(take, cand, best_val)
                best_idx = jnp.where(take, i, best_idx)
        pivot_row = [jnp.zeros((1, B), jnp.float32) for _ in range(n)]
        pivot_val = jnp.zeros((1, B), jnp.float32)
        for i in range(n):
            is_p = best_idx == i
            pivot_val = jnp.where(is_p, D[i][col_off], pivot_val)
            for j in range(col_off, n):
                pivot_row[j] = jnp.where(is_p, D[i][j], pivot_row[j])
        logabs = logabs + jnp.log(jnp.maximum(jnp.abs(pivot_val), tiny))
        safe_p = jnp.where(jnp.abs(pivot_val) > tiny, pivot_val, 1.0)
        for i in range(n):
            is_p = best_idx == i
            remaining = jnp.logical_and(used[i] < 0.5, jnp.logical_not(is_p))
            m = jnp.where(remaining, D[i][col_off] / safe_p, 0.0)
            for j in range(col_off + 1, n):
                D[i][j] = D[i][j] - m * pivot_row[j]
            used[i] = jnp.where(is_p, 1.0, used[i])
        col_off += 1
    return 2.0 * logabs


def _slater_logp_multistate(x, nxs, nys, n, dim, num_shells):
    """Mixed-state log density: per-walker occupations.

    x: (n*dim, B); nxs/nys: (n, B) int32 per-slot 1D quantum numbers.
    Orbital values are resolved by masked sums over the K-entry Hermite
    table (the in-kernel analog of the one-hot matmul build).
    """
    gauss, hx, hy = _hermite_tables(x, n, dim, num_shells)
    K = num_shells
    D = []
    for i in range(n):
        row = []
        for j in range(n):
            nxj = nxs[j : j + 1]
            nyj = nys[j : j + 1]
            vx = jnp.zeros_like(hx[i][0])
            vy = jnp.zeros_like(hy[i][0])
            for k in range(K):
                vx = vx + jnp.where(nxj == k, hx[i][k], 0.0)
                vy = vy + jnp.where(nyj == k, hy[i][k], 0.0)
            row.append(gauss[i] * vx * vy)
        D.append(row)
    return _ge_logabsdet_rows(D, n)


def _metropolis_multistate_kernel(
    seed_ref, x_ref, tau_ref, nx_ref, ny_ref,
    out_x_ref, out_logp_ref, out_acc_ref,
    *, steps, n, dim, num_shells,
):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    d = n * dim
    x = x_ref[:]
    B = x.shape[-1]
    tau = tau_ref[:]
    nxs = nx_ref[:]
    nys = ny_ref[:]
    logp = _slater_logp_multistate(x, nxs, nys, n, dim, num_shells)
    acc = jnp.zeros((1, B), jnp.float32)

    def body(_, carry):
        x, logp, acc = carry
        noise = _normals((d, B))
        x_new = x + tau * noise
        logp_new = _slater_logp_multistate(x_new, nxs, nys, n, dim, num_shells)
        u = _uniform01((1, B))
        accept = u < jnp.exp(jnp.minimum(logp_new - logp, 0.0))
        x = jnp.where(accept, x_new, x)
        logp = jnp.where(accept, logp_new, logp)
        return x, logp, acc + accept.astype(jnp.float32)

    x, logp, acc = jax.lax.fori_loop(0, steps, body, (x, logp, acc))
    out_x_ref[:] = x
    out_logp_ref[:] = logp
    out_acc_ref[:] = acc / max(steps, 1)


@functools.partial(
    jax.jit, static_argnames=("steps", "num_shells", "interpret")
)
def metropolis_free_fermion_multistate(
    x0: jax.Array,
    seed: jax.Array,
    tau: jax.Array,
    steps: int,
    nx_occ: jax.Array,
    ny_occ: jax.Array,
    num_shells: int = 8,
    interpret: bool = False,
):
    """Fused Metropolis chain with PER-WALKER orbital occupations.

    Args:
      x0: (B, n, dim) float32 walker positions.
      seed: int32 scalar.
      tau: scalar or (B,).
      steps: chain length (static).
      nx_occ, ny_occ: (B, n) int32 — each walker's occupied orbitals' 1D
        quantum numbers (gathered from the state table OUTSIDE the kernel).
      num_shells: Hermite recurrence depth.

    Returns:
      (x, logp, accept_rate): (B, n, dim), (B,), (B,).
    """
    B, n, dim = x0.shape
    d = n * dim
    BW = min(B, 256)  # multistate build holds more rows live than the GS case
    if B % BW:
        raise ValueError(f"batch {B} must be a multiple of {BW}")
    x_cm = x0.reshape(B, d).T.astype(jnp.float32)
    tau_b = jnp.broadcast_to(jnp.asarray(tau, jnp.float32), (B,))[None, :]
    seed_arr = jnp.asarray([seed], jnp.int32)
    nx_cm = nx_occ.T.astype(jnp.int32)  # (n, B)
    ny_cm = ny_occ.T.astype(jnp.int32)

    kernel = functools.partial(
        _metropolis_multistate_kernel,
        steps=steps, n=n, dim=dim, num_shells=num_shells,
    )
    row_block = lambda rows: pl.BlockSpec(
        (rows, BW), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    x_out, logp, acc = pl.pallas_call(
        kernel,
        grid=(B // BW,),
        out_shape=(
            jax.ShapeDtypeStruct((d, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_block(d),
            row_block(1),
            row_block(n),
            row_block(n),
        ],
        out_specs=(row_block(d), row_block(1), row_block(1)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, x_cm, tau_b, nx_cm, ny_cm)
    return x_out.T.reshape(B, n, dim), logp[0], acc[0]


# ---- multi-chip wrappers (shard_map over the walker mesh) ----
#
# The block-grid kernels above are per-device programs; under GSPMD they would
# otherwise be partitioned blindly.  These wrappers run one kernel per shard
# via ``jax.shard_map``: walker arrays (x0, per-walker tau/occupations) are
# split on the mesh's walker axis, the scalar seed is decorrelated per shard
# by folding in ``lax.axis_index`` (each in-kernel program additionally
# offsets by ``pl.program_id``), and outputs stay walker-sharded — the
# TPU-native analog of a multi-GPU sampler launch, with zero collectives
# (Metropolis chains are embarrassingly parallel across walkers).


def _per_shard_seed(seed, axis_name):
    # Distinct 32-bit streams per shard: the in-kernel offset is program_id
    # (< B/BW per shard), so spacing shards 2**16 apart keeps streams disjoint
    # for any realistic shard block count.  int32 wraparound is fine.
    idx = jax.lax.axis_index(axis_name).astype(jnp.int32)
    return jnp.asarray(seed, jnp.int32) + idx * jnp.int32(1 << 16)


def metropolis_free_fermion_sharded(
    mesh,
    x0: jax.Array,
    seed: jax.Array,
    tau,
    steps: int,
    nx_occ: tuple,
    ny_occ: tuple,
    num_shells: int = 8,
    interpret: bool = False,
    axis: str = "walkers",
):
    """``metropolis_free_fermion`` over every device of a walker mesh.

    x0 is (B, n, dim) with B divisible by (mesh size × kernel block); tau is a
    scalar (replicated) or (B,) (walker-sharded).  Returns walker-sharded
    (x, logp, accept_rate).
    """
    from jax.sharding import PartitionSpec as P

    tau = jnp.asarray(tau, jnp.float32)
    tau_spec = P(axis) if tau.ndim == 1 else P()

    def local(x0_l, seed_l, tau_l):
        return metropolis_free_fermion(
            x0_l, _per_shard_seed(seed_l, axis), tau_l, steps,
            nx_occ, ny_occ, num_shells, interpret,
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), tau_spec),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )(x0, jnp.asarray(seed, jnp.int32), tau)


def metropolis_free_fermion_multistate_sharded(
    mesh,
    x0: jax.Array,
    seed: jax.Array,
    tau,
    steps: int,
    nx_occ: jax.Array,
    ny_occ: jax.Array,
    num_shells: int = 8,
    interpret: bool = False,
    axis: str = "walkers",
):
    """Mixed-state fused chain over a walker mesh; per-walker occupations
    (B, n) shard with the walkers."""
    from jax.sharding import PartitionSpec as P

    tau = jnp.asarray(tau, jnp.float32)
    tau_spec = P(axis) if tau.ndim == 1 else P()

    def local(x0_l, seed_l, tau_l, nx_l, ny_l):
        return metropolis_free_fermion_multistate(
            x0_l, _per_shard_seed(seed_l, axis), tau_l, steps,
            nx_l, ny_l, num_shells, interpret,
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), tau_spec, P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )(x0, jnp.asarray(seed, jnp.int32), tau, nx_occ, ny_occ)
