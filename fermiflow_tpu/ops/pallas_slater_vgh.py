"""Fused Slater-determinant (value, gradient, Hessian) kernel (Pallas/TPU).

Closed-form base VGH — the quantities seeding the Hessian-flow local-energy
engine (``vmc/hessian_flow.local_energy_flow``) — computed entirely in the
sublane-major walker layout of the sampler/Hessian-flow kernels.

Why a kernel: the XLA implementation (``physics/slater.slater_derivs`` +
``physics/slater.logdet_vgh``) is already closed form (no autodiff), but its
arithmetic runs on (batch, n, n) arrays whose LAST axis is the tiny Slater
dimension (n <= 10) — the TPU vector lanes are 128 wide, so every elementwise
op and small einsum uses at most n/128 of the machine.  Measured: 1.84 ms at
N=6/batch 8192 (validation/runs/bvgh_timing.json) for ~25 MFLOP of actual
work — ~70x off the VPU roofline, purely a layout problem.  This kernel lays
the batch across lanes+sublanes ((8, B/8) tiles, as everywhere else in
ops/pallas_*) and unrolls the n-dimension in registers, the same recipe that
took the Metropolis sampler from 3.7M to 2.6G walker-steps/s.

Math (same identities as ``physics/slater.logdet_vgh``, reference custom
backward at ``/root/reference/src/slater.py:45-62`` is the autograd analog):
row i of D depends only on particle i, so with A = D^{-1},

    B[i,a,k]  = sum_j D1[i,j,a] A[j,k]
    C[i,a,b]  = sum_j A[j,i] D2[i,j,a,b]
    d log|det| / dx_{i,a}            = B[i,a,i]
    d2 log|det| / dx_{i,a} dx_{k,b}  = delta_ik C[i,a,b] - B[k,b,i] B[i,a,k]

Orbital derivatives come from the Hermite ladder identities
(``physics/slater._ho1d_val_d1_d2``): psi_m' = sqrt(m/2) psi_{m-1}
- sqrt((m+1)/2) psi_{m+1} and psi_m'' = (u^2 - 2m - 1) psi_m — one extra
Hermite order, no transcendentals beyond the Gaussian the sampler already
pays.

The inverse uses the same swap-free pivoted Gauss-Jordan as
``ops/logdet.gauss_jordan_inv``, unrolled over tiles: pivot rows are selected
by masked tournament argmax and applied through selects, so there is no
data-dependent control flow.  log|det| falls out of the pivot magnitudes for
free (the kernel returns the full log-density y = 2 sum_sectors log|det|).

Spin sectors factorize (H block-diagonal, ``physics/base_dist.log_prob_vgh``);
the kernel evaluates each sector independently and writes the cross-sector
Hessian blocks as zeros.

Outputs (wrapper): y (B,), g (B, n*dim), H (B, n*dim, n*dim) — drop-in for
``FreeFermion.log_prob_vgh``.  ``packed=True`` instead returns H as the
(B, d(d+1)/2) upper triangle in ``np.triu_indices`` order — the exact form
``ops/pallas_hessian_flow`` packs before its kernel, so the chained
sampler -> VGH -> Hessian-flow path never materializes the full matrix.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fermiflow_tpu.ops.pallas_metropolis import (
    _SUB,
    _choose_block,
    _rows,
    _to_tiles,
)

__all__ = [
    "slater_vgh_pallas",
    "slater_vgh_pallas_sharded",
    "slater_vgh_ms_pallas",
    "slater_vgh_ms_pallas_sharded",
]


def _psi1d(c, K):
    """1D HO eigenfunction tiles psi_0..psi_K plus first/second derivatives
    psi'_0..psi'_{K-1}, psi''_0..psi''_{K-1} for one coordinate tile c.

    Same normalized Hermite recurrence as the sampler's ``_hermite_tables``
    evaluated ONE order higher so the ladder identity yields psi' without new
    transcendentals.
    """
    pref = float(np.pi ** -0.25)
    g = pref * jnp.exp(-0.5 * c * c)
    hs = [jnp.ones_like(c)]
    if K + 1 > 1:
        hs.append(float(np.sqrt(2.0)) * c)
    for m in range(1, K):
        hs.append(
            float(np.sqrt(2.0 / (m + 1))) * c * hs[m]
            - float(np.sqrt(m / (m + 1.0))) * hs[m - 1]
        )
    psi = [g * h for h in hs]  # orders 0..K
    dpsi = []
    d2psi = []
    c2 = c * c
    for m in range(K):
        lo = float(np.sqrt(m / 2.0))
        hi = float(np.sqrt((m + 1) / 2.0))
        below = psi[m - 1] if m > 0 else None
        dm = -hi * psi[m + 1]
        if below is not None:
            dm = dm + lo * below
        dpsi.append(dm)
        d2psi.append((c2 - float(2 * m + 1)) * psi[m])
    return psi, dpsi, d2psi


def _gj_inverse(D, n):
    """Swap-free pivoted Gauss-Jordan on a list-of-tiles matrix.

    Returns (A, logabs): A[i][j] tiles of D^{-1} and log|det D|.  Pivot
    selection/gather/writeback are all lane-wise selects (per-walker
    pivoting); rows never move, the permutation is resolved at the end by
    one-hot contraction over the recorded pivot masks — the tile-unrolled
    twin of ``ops/logdet.gauss_jordan_inv``.
    """
    tiny = 1e-30
    zero = jnp.zeros_like(D[0][0])
    one = zero + 1.0
    # Augmented [D | I], n x 2n tiles.
    M = [
        [D[i][j] for j in range(n)]
        + [one if j == i else zero for j in range(n)]
        for i in range(n)
    ]
    used = [zero for _ in range(n)]
    logabs = zero
    ohs = []  # per column: n float pivot masks
    for k in range(n):
        best_val = None
        best_idx = None
        for i in range(n):
            cand = jnp.where(used[i] > 0.5, -1.0, jnp.abs(M[i][k]))
            if best_val is None:
                best_val = cand
                best_idx = zero.astype(jnp.int32)
            else:
                take = cand > best_val
                best_val = jnp.where(take, cand, best_val)
                best_idx = jnp.where(take, i, best_idx)
        is_p = [best_idx == i for i in range(n)]
        pivot_val = zero
        for i in range(n):
            pivot_val = jnp.where(is_p[i], M[i][k], pivot_val)
        logabs = logabs + jnp.log(jnp.maximum(jnp.abs(pivot_val), tiny))
        safe_p = jnp.where(jnp.abs(pivot_val) > tiny, pivot_val, 1.0)
        inv_p = 1.0 / safe_p
        # Normalized pivot row, columns k..2n-1 (earlier columns are zero in
        # every not-yet-used row, the pivot row included).
        prow = [zero for _ in range(2 * n)]
        for i in range(n):
            for j in range(k, 2 * n):
                prow[j] = jnp.where(is_p[i], M[i][j], prow[j])
        prow = [p * inv_p for p in prow]
        for i in range(n):
            isp_f = is_p[i].astype(jnp.float32)
            mult = (1.0 - isp_f) * M[i][k]
            for j in range(k + 1, 2 * n):
                new = M[i][j] - mult * prow[j]
                M[i][j] = jnp.where(is_p[i], prow[j], new)
            M[i][k] = isp_f  # column k cleared everywhere else
            used[i] = jnp.where(is_p[i], 1.0, used[i])
        ohs.append([p.astype(jnp.float32) for p in is_p])
    # Row p_k of the right half is row k of the inverse.
    A = [
        [
            sum(ohs[k][i] * M[i][n + j] for i in range(n))
            for j in range(n)
        ]
        for k in range(n)
    ]
    return A, logabs


def _vgh_from_factors(D, D1x, D1y, D2xx, D2yy, D2xy, m):
    """(logabs, g_rows, H_lookup) from assembled factor matrices (each an
    m x m list-of-tiles): the GJ inverse + determinant-calculus B/C
    contractions shared by the static-occupation and per-walker-occupation
    kernels."""
    A, logabs = _gj_inverse(D, m)

    # B[i,a,k] = sum_j D1[i,j,a] A[j,k]
    Bx = [
        [sum(D1x[i][j] * A[j][k] for j in range(m)) for k in range(m)]
        for i in range(m)
    ]
    By = [
        [sum(D1y[i][j] * A[j][k] for j in range(m)) for k in range(m)]
        for i in range(m)
    ]
    g_rows = []
    for i in range(m):
        g_rows.append(Bx[i][i])
        g_rows.append(By[i][i])

    # C[i,a,b] = sum_j A[j,i] D2[i,j,a,b]
    Cxx = [sum(A[j][i] * D2xx[i][j] for j in range(m)) for i in range(m)]
    Cyy = [sum(A[j][i] * D2yy[i][j] for j in range(m)) for i in range(m)]
    Cxy = [sum(A[j][i] * D2xy[i][j] for j in range(m)) for i in range(m)]

    B = (Bx, By)
    C = {(0, 0): Cxx, (0, 1): Cxy, (1, 0): Cxy, (1, 1): Cyy}

    def H_entry(i, a, k, b):
        val = -B[b][k][i] * B[a][i][k]
        if i == k:
            val = val + C[(a, b)][i]
        return val

    return logabs, g_rows, H_entry


def _sector_vgh(xs, first, nxs, nys, dim, K):
    """(logabs, g_rows, H_lookup) for one spin sector.

    xs: full coordinate tile list; particles [first, first + m) belong to
    the sector, occupying orbitals with 1D quantum numbers nxs/nys (static
    tuples).  g_rows has 2m tiles; H_lookup(i, a, k, b) returns the packed
    local Hessian entry (sector-local particle indices).
    """
    m = len(nxs)
    tab = []
    for i in range(m):
        cx = xs[(first + i) * dim + 0]
        cy = xs[(first + i) * dim + 1]
        tab.append((_psi1d(cx, K), _psi1d(cy, K)))

    D, D1x, D1y, D2xx, D2yy, D2xy = ([], [], [], [], [], [])
    for i in range(m):
        (px, dpx, d2px), (py, dpy, d2py) = tab[i]
        D.append([px[nxs[j]] * py[nys[j]] for j in range(m)])
        D1x.append([dpx[nxs[j]] * py[nys[j]] for j in range(m)])
        D1y.append([px[nxs[j]] * dpy[nys[j]] for j in range(m)])
        D2xx.append([d2px[nxs[j]] * py[nys[j]] for j in range(m)])
        D2yy.append([px[nxs[j]] * d2py[nys[j]] for j in range(m)])
        D2xy.append([dpx[nxs[j]] * dpy[nys[j]] for j in range(m)])

    return _vgh_from_factors(D, D1x, D1y, D2xx, D2yy, D2xy, m)


def _multistate_vgh(xs, wxs, wys, n, dim, K):
    """(logabs, g_rows, H_lookup) with PER-WALKER occupations.

    wxs/wys: per-slot one-hot float masks over the Hermite orders (length-n
    lists of K tiles, built once per launch from the walkers' quantum
    numbers — the same mask-FMA table resolve as the mixed-state sampler
    kernel's ``_slater_logp_multistate``).  Every orbital factor resolves
    as a K-term mask-weighted sum; the determinant calculus downstream is
    shared with the static kernel.
    """
    tab = [(_psi1d(xs[i * dim + 0], K), _psi1d(xs[i * dim + 1], K))
           for i in range(n)]

    def sel(vals, masks):
        out = masks[0] * vals[0]
        for k in range(1, K):
            out = out + masks[k] * vals[k]
        return out

    D, D1x, D1y, D2xx, D2yy, D2xy = ([], [], [], [], [], [])
    for i in range(n):
        (px, dpx, d2px), (py, dpy, d2py) = tab[i]
        rowD, r1x, r1y, r2x, r2y, rxy = ([], [], [], [], [], [])
        for j in range(n):
            vx, vy = sel(px, wxs[j]), sel(py, wys[j])
            dvx, dvy = sel(dpx, wxs[j]), sel(dpy, wys[j])
            d2vx, d2vy = sel(d2px, wxs[j]), sel(d2py, wys[j])
            rowD.append(vx * vy)
            r1x.append(dvx * vy)
            r1y.append(vx * dvy)
            r2x.append(d2vx * vy)
            r2y.append(vx * d2vy)
            rxy.append(dvx * dvy)
        D.append(rowD)
        D1x.append(r1x)
        D1y.append(r1y)
        D2xx.append(r2x)
        D2yy.append(r2y)
        D2xy.append(rxy)

    return _vgh_from_factors(D, D1x, D1y, D2xx, D2yy, D2xy, n)


def _slater_vgh_ms_kernel(
    x_ref, nx_ref, ny_ref, out_y_ref, out_g_ref, out_h_ref,
    *, n, dim, num_shells,
):
    from fermiflow_tpu.ops.pallas_metropolis import _one_hot_masks

    d = n * dim
    xs = tuple(_rows(x_ref[:], d))
    wxs = _one_hot_masks(_rows(nx_ref[:], n), num_shells)
    wys = _one_hot_masks(_rows(ny_ref[:], n), num_shells)
    y, g_rows, H = _multistate_vgh(xs, wxs, wys, n, dim, num_shells)
    out_y_ref[:] = 2.0 * y
    for r in range(d):
        out_g_ref[_SUB * r : _SUB * (r + 1)] = 2.0 * g_rows[r]
    row = 0
    for p in range(d):
        i, a = divmod(p, dim)
        for q in range(p, d):
            k, b = divmod(q, dim)
            out_h_ref[_SUB * row : _SUB * (row + 1)] = 2.0 * H(i, a, k, b)
            row += 1


def _slater_vgh_kernel(
    x_ref, out_y_ref, out_g_ref, out_h_ref,
    *, n, dim, nx_occ, ny_occ, num_shells, nx_dn=(), ny_dn=(),
):
    d = n * dim
    nup, ndown = len(nx_occ), len(nx_dn)
    xs = tuple(_rows(x_ref[:], d))
    y_up, g_up, H_up = _sector_vgh(xs, 0, nx_occ, ny_occ, dim, num_shells)
    y = y_up
    g_rows = list(g_up)
    lookups = [(0, nup, H_up)]
    if ndown:
        y_dn, g_dn, H_dn = _sector_vgh(
            xs, nup, nx_dn, ny_dn, dim, num_shells)
        y = y + y_dn
        g_rows += list(g_dn)
        lookups.append((nup, n, H_dn))

    zero = jnp.zeros_like(xs[0])
    out_y_ref[:] = 2.0 * y
    for r in range(d):
        out_g_ref[_SUB * r : _SUB * (r + 1)] = 2.0 * g_rows[r]
    # Packed upper triangle in np.triu_indices order; sectors are
    # block-diagonal (cross blocks exactly zero).
    row = 0
    for p in range(d):
        i, a = divmod(p, dim)
        for q in range(p, d):
            k, b = divmod(q, dim)
            val = zero
            for lo, hi, H in lookups:
                if lo <= i < hi and lo <= k < hi:
                    val = 2.0 * H(i - lo, a, k - lo, b)
            out_h_ref[_SUB * row : _SUB * (row + 1)] = val
            row += 1


@functools.partial(
    jax.jit,
    static_argnames=("nx_occ", "ny_occ", "num_shells", "nx_dn", "ny_dn",
                     "interpret", "block_walkers", "packed", "tiles_in",
                     "tiles_out"),
)
def slater_vgh_pallas(
    x: jax.Array,
    nx_occ: tuple,
    ny_occ: tuple,
    num_shells: int = 8,
    nx_dn: tuple = (),
    ny_dn: tuple = (),
    interpret: bool = False,
    block_walkers: int | None = None,
    packed: bool = False,
    tiles_in: bool = False,
    tiles_out: bool = False,
):
    """(y, g, H) of the free-fermion base log-density, fused on-chip.

    Args:
      x: (B, n, dim) walker positions, dim == 2 — or, with ``tiles_in``, the
        sublane-major tile block (d*8, B/8) another kernel already emitted.
      nx_occ/ny_occ (and optional nx_dn/ny_dn for a second spin sector):
        static tuples of occupied orbitals' 1D quantum numbers.
      num_shells: Hermite orders available (max quantum number + 1); the
        kernel evaluates one extra order for the ladder derivatives.
      packed: return H as the (B, d(d+1)/2) upper triangle
        (np.triu_indices order) instead of the full (B, d, d) matrix.
      tiles_in / tiles_out: accept/return raw (rows*8, B/8) tile blocks —
        the chained sampler -> VGH -> Hessian-flow path threads these
        through XLA untouched, so no layout transition is paid at the
        kernel boundaries (round-4 VERDICT item: per-kernel relayout was
        the dominant step residual).  Requires B % 8 == 0 and a legal
        block partition of B (no padding in tile mode).

    Returns:
      (y, g, H): (B,), (B, d), and (B, d, d) [or (B, nut) packed] — the
      same quantities as ``FreeFermion.log_prob_vgh`` in float32.  With
      ``tiles_out``: ((8, B/8), (d*8, B/8), (nut*8, B/8)) raw tiles.
    """
    if len(nx_occ) + len(nx_dn) == 0:
        raise ValueError("occupations must cover all particles")
    n = len(nx_occ) + len(nx_dn)
    dim = 2
    if tiles_in:
        d = n * dim
        if x.shape[0] != d * _SUB:
            raise ValueError(
                f"tiles_in expects ({d * _SUB}, B/8), got {x.shape}"
            )
        B = x.shape[1] * _SUB
    else:
        B, n_x, dim_x = x.shape
        if dim_x != 2:
            raise ValueError("slater_vgh_pallas supports dim == 2 only")
        if n_x != n:
            raise ValueError("occupations must cover all particles")
        d = n * dim
    nut = d * (d + 1) // 2
    if block_walkers:
        BW, Bp = block_walkers, B
        if B % BW or (BW != B and (BW // _SUB) % 128):
            raise ValueError(
                f"bad walker block {BW} for batch {B}: must divide B and "
                f"give lane blocks divisible by 128 (BW % 1024 == 0) unless "
                f"BW == B"
            )
    else:
        BW, Bp = _choose_block(B, cap=1024)
    if tiles_in:
        if Bp != B:
            raise ValueError(
                f"tiles_in requires an unpadded block partition of B={B}"
            )
        x_cm = x.astype(jnp.float32)
    else:
        if Bp != B:
            x = jnp.pad(x, ((0, Bp - B), (0, 0), (0, 0)), mode="edge")
        x_cm = _to_tiles(x.reshape(Bp, d).T.astype(jnp.float32), d, Bp)

    kernel = functools.partial(
        _slater_vgh_kernel,
        n=n, dim=dim, nx_occ=tuple(nx_occ), ny_occ=tuple(ny_occ),
        num_shells=num_shells, nx_dn=tuple(nx_dn), ny_dn=tuple(ny_dn),
    )
    LW = BW // _SUB
    row_block = lambda rows: pl.BlockSpec(
        (rows * _SUB, LW), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    y_t, g_t, h_t = pl.pallas_call(
        kernel,
        grid=(Bp // BW,),
        out_shape=(
            jax.ShapeDtypeStruct((_SUB, Bp // _SUB), jnp.float32),
            jax.ShapeDtypeStruct((d * _SUB, Bp // _SUB), jnp.float32),
            jax.ShapeDtypeStruct((nut * _SUB, Bp // _SUB), jnp.float32),
        ),
        in_specs=[row_block(d)],
        out_specs=(row_block(1), row_block(d), row_block(nut)),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(x_cm)

    if tiles_out:
        return y_t, g_t, h_t

    y = y_t.reshape(1, Bp)[0, :B]
    g = g_t.reshape(d, Bp).T[:B]
    Hp = h_t.reshape(nut, Bp).T[:B]
    if packed:
        return y, g, Hp
    iu = np.triu_indices(d)
    H = jnp.zeros((B, d, d), jnp.float32)
    H = H.at[:, iu[0], iu[1]].set(Hp)
    H = H.at[:, iu[1], iu[0]].set(Hp)
    return y, g, H


@functools.partial(
    jax.jit,
    static_argnames=("num_shells", "interpret", "block_walkers", "packed",
                     "tiles_in", "tiles_out"),
)
def slater_vgh_ms_pallas(
    x: jax.Array,
    nx: jax.Array,
    ny: jax.Array,
    num_shells: int = 8,
    interpret: bool = False,
    block_walkers: int | None = None,
    packed: bool = False,
    tiles_in: bool = False,
    tiles_out: bool = False,
):
    """Mixed-state (y, g, H): per-walker orbital occupations, fused on-chip.

    The finite-temperature analog of ``slater_vgh_pallas`` — drop-in for
    ``FreeFermion.log_prob_vgh_multstates`` (one spin sector, the
    reference's finite-T model is spin-polarized, ``src/orbitals.py:47-49``).

    Args:
      x: (B, n, dim), dim == 2 (or the (d*8, B/8) tile block with
        ``tiles_in``; nx/ny are then (n*8, B/8) int32 tiles).
      nx, ny: (B, n) int32 — each walker's occupied orbitals' 1D quantum
        numbers (gathered from the state table outside, exactly as the
        mixed-state sampler kernel takes them).
      num_shells: Hermite orders covering the state table; one extra order
        is evaluated for the ladder derivatives.
    """
    if tiles_in:
        n = nx.shape[0] // _SUB
        dim = 2
        d = n * dim
        B = x.shape[1] * _SUB
        if x.shape[0] != d * _SUB:
            raise ValueError(
                f"tiles_in expects x ({d * _SUB}, B/8), got {x.shape}"
            )
    else:
        B, n, dim = x.shape
        if dim != 2:
            raise ValueError("slater_vgh_ms_pallas supports dim == 2 only")
        if nx.shape != (B, n) or ny.shape != (B, n):
            raise ValueError("nx/ny must be (B, n) per-walker quantum numbers")
        d = n * dim
    nut = d * (d + 1) // 2
    if block_walkers:
        BW, Bp = block_walkers, B
        if B % BW or (BW != B and (BW // _SUB) % 128):
            raise ValueError(
                f"bad walker block {BW} for batch {B}: must divide B and "
                f"give lane blocks divisible by 128 (BW % 1024 == 0) unless "
                f"BW == B"
            )
    else:
        BW, Bp = _choose_block(B, cap=1024)
    if tiles_in:
        if Bp != B:
            raise ValueError(
                f"tiles_in requires an unpadded block partition of B={B}"
            )
        x_cm = x.astype(jnp.float32)
        nx_cm = nx
        ny_cm = ny
    else:
        if Bp != B:
            x = jnp.pad(x, ((0, Bp - B), (0, 0), (0, 0)), mode="edge")
            nx = jnp.pad(nx, ((0, Bp - B), (0, 0)), mode="edge")
            ny = jnp.pad(ny, ((0, Bp - B), (0, 0)), mode="edge")
        x_cm = _to_tiles(x.reshape(Bp, d).T.astype(jnp.float32), d, Bp)
        nx_cm = _to_tiles(nx.T.astype(jnp.int32), n, Bp)
        ny_cm = _to_tiles(ny.T.astype(jnp.int32), n, Bp)

    kernel = functools.partial(
        _slater_vgh_ms_kernel, n=n, dim=dim, num_shells=num_shells,
    )
    LW = BW // _SUB
    row_block = lambda rows: pl.BlockSpec(
        (rows * _SUB, LW), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    y_t, g_t, h_t = pl.pallas_call(
        kernel,
        grid=(Bp // BW,),
        out_shape=(
            jax.ShapeDtypeStruct((_SUB, Bp // _SUB), jnp.float32),
            jax.ShapeDtypeStruct((d * _SUB, Bp // _SUB), jnp.float32),
            jax.ShapeDtypeStruct((nut * _SUB, Bp // _SUB), jnp.float32),
        ),
        in_specs=[row_block(d), row_block(n), row_block(n)],
        out_specs=(row_block(1), row_block(d), row_block(nut)),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(x_cm, nx_cm, ny_cm)

    if tiles_out:
        return y_t, g_t, h_t

    y = y_t.reshape(1, Bp)[0, :B]
    g = g_t.reshape(d, Bp).T[:B]
    Hp = h_t.reshape(nut, Bp).T[:B]
    if packed:
        return y, g, Hp
    iu = np.triu_indices(d)
    H = jnp.zeros((B, d, d), jnp.float32)
    H = H.at[:, iu[0], iu[1]].set(Hp)
    H = H.at[:, iu[1], iu[0]].set(Hp)
    return y, g, H


def slater_vgh_ms_pallas_sharded(
    mesh, x, nx, ny, num_shells=8, interpret=False, packed=False,
):
    """shard_map wrapper: per-shard mixed-state VGH over the walker mesh."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    w = P(axis)

    def local(x_l, nx_l, ny_l):
        return slater_vgh_ms_pallas(
            x_l, nx_l, ny_l, num_shells, interpret=interpret, packed=packed,
        )

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(w, w, w),
        out_specs=(w, w, w),
        check_vma=False,
    )(x, nx, ny)


def slater_vgh_pallas_sharded(
    mesh, x, nx_occ, ny_occ, num_shells=8, nx_dn=(), ny_dn=(),
    interpret=False, packed=False,
):
    """shard_map wrapper: per-shard kernel launch over the walker mesh."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    w = P(axis)

    def local(x_l):
        return slater_vgh_pallas(
            x_l, nx_occ, ny_occ, num_shells, nx_dn, ny_dn,
            interpret=interpret, packed=packed,
        )

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(w,),
        out_specs=(w, w, w),
        check_vma=False,
    )(x)
