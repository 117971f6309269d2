"""Fused REINFORCE parameter-gradient kernel (Pallas/TPU).

The score-function VMC gradient needs grad_theta sum_i w_i log p_theta(x_i)
with the samples x_i held fixed (w_i = (Eloc_i - Ebar)/B, stopped).  The
reference — and our XLA path — computes it by reverse-integrating the
coupled (x, logdet) ODE from x and back-propagating through the solve
(reference ``src/VMC.py:46,58`` + ``src/NeuralODE/nnModule.py:75-159``);
measured on one v5e chip that value_and_grad is ~28 ms at N=6 / batch 8192 /
8 dopri5 steps — 87% of the whole training step (validation/runs/
roofline_train.json).

This kernel removes autodiff from that path entirely.  With x = Phi_theta(z)
and the flow identity  log p_theta(Phi_theta(z)) = log p0(z) - int div v dt,
holding x fixed gives the exact surrogate

    grad_theta sum_i w_i log p_theta(x_i)
      = grad_theta sum_i w_i [ -int_{t0}^{t1} div v_theta(x_i(t)) dt
                               - stopgrad(g_i) . x_theta(t1; z_i) ],

where g_i = grad_x log p_theta(x_i) comes free from the forward Hessian-flow
kernel (``ops/pallas_hessian_flow.py``).  The continuous adjoint of that
functional, with a = adjoint of x and A = dv/dx:

    dx/dt     = v(x)                     x(t1) = x_i          (backward)
    da/dt     = -A^T a + w grad(div)     a(t1) = -w_i g_i
    theta_bar = int_{t0}^{t1} [ (dv/dtheta)^T a - w ddiv/dtheta ] dt

integrated t1 -> t0 on the SAME fixed grid (optimize-then-discretize, the
trade ``ode/adjoint.py`` already makes; at trained fields the grid error is
~1e-10 relative, validation/runs/ode_steps_n6.json).  Everything is closed
form for the backflow field:

  * per pair (i,j), with u = x_i - x_j, da = a_i - a_j, P = eta'/r uu^T +
    eta I:  (A^T a)_i = P da (= -(A^T a)_j) — the kernel never materializes
    A, and there is NO Hessian state, so the d^3 term of the forward kernel
    is absent;
  * grad(div) per pair: 2 phi'(r) u / r with phi' = eta'' r + 3 eta';
  * dtheta integrands per hidden unit h (z = w1_h r + b1_h, s = sigma(z)):
      d eta/d w2_h = s,  d eta/d w1_h = w2_h r s',  d eta/d b1_h = w2_h s',
      d eta'/d w2_h = w1_h s',  d eta'/d w1_h = w2_h (s' + w1_h r s''),
      d eta'/d b1_h = w2_h w1_h s'',
    entering through  (dv/dtheta)^T a = d eta/dtheta * (u . da)  and
    d div/dtheta = 2 r d eta'/dtheta + 4 d eta/dtheta per unordered pair
    (one-body mu terms analogous with coefficients 1 and 2).

theta_bar accumulates inside the RK loop with the tableau's b-weights (it
never feeds back into the dynamics, so no stage slopes are stored for it).
Per-walker partials live as (8, B/8) sublane-major tiles like every other
kernel here; padded walkers carry w = 0 and a = 0 so they contribute exactly
nothing to the parameter reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fermiflow_tpu.ode.integrators import TABLEAUS

__all__ = ["reinforce_flow_grad_pallas", "reinforce_flow_grad_pallas_sharded"]


def reinforce_layout(B, n, dim, d_eta, d_mu, stages, block_walkers=None):
    """(BW, SF, Bpad) the wrapper will choose for these shapes.

    VMEM per walker: state+slopes for (x, a) ((2d)(stages+2)), theta rows
    (nq), pair scratch (~10 n^2).  Exported so callers can decide up front
    whether the io_tiles chaining mode is available (SF == 8, Bpad == B).
    """
    d = n * dim
    nq = 3 * d_eta + 3 * d_mu
    bytes_per_walker = 4 * (2 * d * (stages + 2) + nq + 10 * n * n)
    budget = 12 * 2**20
    if block_walkers is None:
        block_walkers = 128
        for cand in (2048, 1024, 512, 256):
            if cand * bytes_per_walker <= budget:
                block_walkers = cand
                break
    BW = min(B, block_walkers)
    SF = max(1, min(8, BW // 128))
    Bpad = -(-B // BW) * BW
    return BW, SF, Bpad


def _sigmoid(z):
    return 1.0 / (1.0 + jnp.exp(-z))


def _adjoint_rhs_and_sources(
    x, a, w, eta_refs, mu_refs, *, n, dim, d_eta, d_mu, sf
):
    """One evaluation of (dx/dt, da/dt) and the theta integrand q.

    x, a: (d*sf, B) coordinate-major rows; w: (sf, B).  Returns
    (v, da_dt, q_eta, q_mu) with q_* lists of (sf, B) tiles ordered
    [w2 rows..., w1 rows..., b1 rows...].
    """
    assert dim == 2
    d = n * dim
    B = x.shape[-1]
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    npair = len(pairs)
    row = lambda arr, c: arr[sf * c : sf * (c + 1)]
    xs = [row(x, c) for c in range(d)]
    As = [row(a, c) for c in range(d)]
    zero = lambda: jnp.zeros((sf, B), jnp.float32)

    v = [zero() for _ in range(d)]
    da = [zero() for _ in range(d)]

    # ---- pair geometry + per-pair adjoint scalars ----
    u0 = [xs[2 * i] - xs[2 * j] for (i, j) in pairs]
    u1 = [xs[2 * i + 1] - xs[2 * j + 1] for (i, j) in pairs]
    da0 = [As[2 * i] - As[2 * j] for (i, j) in pairs]
    da1 = [As[2 * i + 1] - As[2 * j + 1] for (i, j) in pairs]
    r_rows = [jnp.sqrt(u0[p] * u0[p] + u1[p] * u1[p]) for p in range(npair)]
    s_rows = [u0[p] * da0[p] + u1[p] * da1[p] for p in range(npair)]
    wr_rows = [w * r_rows[p] for p in range(npair)]

    eta_w1, eta_b1, eta_w2 = eta_refs
    # Hidden-unit loop: dynamics coefficients (eta, eta', eta'' reduced over
    # hidden) AND the eight per-unit pair reductions feeding theta_bar.
    e0 = [zero() for _ in range(npair)]
    e1 = [zero() for _ in range(npair)]
    e2 = [zero() for _ in range(npair)]
    q_eta = [zero() for _ in range(3 * d_eta)]
    for h in range(d_eta):
        w1h = eta_w1[h]
        w2h = eta_w2[h]
        t_ss = zero()      # sum_p s_p * sigma
        t_sd = zero()      # sum_p s_p * sigma'
        t_srd = zero()     # sum_p s_p * r * sigma'
        t_s = zero()       # sum_p sigma            (* w outside)
        t_d = zero()       # sum_p sigma'           (* w outside)
        t_wrd = zero()     # sum_p (w r) * sigma'
        t_wrd2 = zero()    # sum_p (w r) * sigma''
        t_wr2d2 = zero()   # sum_p (w r^2) * sigma''
        for p in range(npair):
            z = r_rows[p] * w1h + eta_b1[h]
            s = _sigmoid(z)
            s1 = s * (1.0 - s)
            s2 = s1 * (1.0 - 2.0 * s)
            e0[p] = e0[p] + s * w2h
            e1[p] = e1[p] + s1 * (w2h * w1h)
            e2[p] = e2[p] + s2 * (w2h * w1h * w1h)
            t_ss = t_ss + s_rows[p] * s
            t_sd = t_sd + s_rows[p] * s1
            t_srd = t_srd + (s_rows[p] * r_rows[p]) * s1
            t_s = t_s + s
            t_d = t_d + s1
            t_wrd = t_wrd + wr_rows[p] * s1
            t_wrd2 = t_wrd2 + wr_rows[p] * s2
            t_wr2d2 = t_wr2d2 + (wr_rows[p] * r_rows[p]) * s2
        # d/dw2_h:  s_p s - w (2 r w1 s' + 4 s)
        q_eta[h] = t_ss - 2.0 * w1h * t_wrd - 4.0 * (w * t_s)
        # d/dw1_h:  w2 [ s_p r s' - w (6 r s' + 2 w1 r^2 s'') ]
        q_eta[d_eta + h] = w2h * (
            t_srd - 6.0 * t_wrd - 2.0 * w1h * t_wr2d2
        )
        # d/db1_h:  w2 [ s_p s' - w (2 r w1 s'' + 4 s') ]
        q_eta[2 * d_eta + h] = w2h * (
            t_sd - 2.0 * w1h * t_wrd2 - 4.0 * (w * t_d)
        )

    # ---- pair dynamics ----
    for p, (i, j) in enumerate(pairs):
        r = r_rows[p]
        iv = 1.0 / r
        ua, ub = u0[p], u1[p]
        # v
        for b, ubv in ((0, ua), (1, ub)):
            contrib = e0[p] * ubv
            v[2 * i + b] = v[2 * i + b] + contrib
            v[2 * j + b] = v[2 * j + b] - contrib
        # -(A^T a): m = (eta'/r)(u.da) u + eta da, +i / -j with overall minus
        c1 = e1[p] * iv
        cu = c1 * s_rows[p]
        m0 = cu * ua + e0[p] * da0[p]
        m1 = cu * ub + e0[p] * da1[p]
        # + w grad(div): cg = 2 phi'/r, phi' = eta'' r + 3 eta'
        cg = (2.0 * (e2[p] * r + 3.0 * e1[p])) * iv * w
        da[2 * i] = da[2 * i] - m0 + cg * ua
        da[2 * i + 1] = da[2 * i + 1] - m1 + cg * ub
        da[2 * j] = da[2 * j] + m0 - cg * ua
        da[2 * j + 1] = da[2 * j + 1] + m1 - cg * ub

    # ---- one-body (mu) ----
    q_mu = []
    if mu_refs is not None:
        mu_w1, mu_b1, mu_w2 = mu_refs
        rho_rows = [
            jnp.sqrt(xs[2 * i] * xs[2 * i] + xs[2 * i + 1] * xs[2 * i + 1])
            for i in range(n)
        ]
        sx_rows = [
            xs[2 * i] * As[2 * i] + xs[2 * i + 1] * As[2 * i + 1]
            for i in range(n)
        ]
        wrho_rows = [w * rho_rows[i] for i in range(n)]
        m0r = [zero() for _ in range(n)]
        m1r = [zero() for _ in range(n)]
        m2r = [zero() for _ in range(n)]
        q_mu = [zero() for _ in range(3 * d_mu)]
        for h in range(d_mu):
            w1h = mu_w1[h]
            w2h = mu_w2[h]
            t_ss = zero()
            t_sd = zero()
            t_srd = zero()
            t_s = zero()
            t_d = zero()
            t_wrd = zero()
            t_wrd2 = zero()
            t_wr2d2 = zero()
            for i in range(n):
                z = rho_rows[i] * w1h + mu_b1[h]
                s = _sigmoid(z)
                s1 = s * (1.0 - s)
                s2 = s1 * (1.0 - 2.0 * s)
                m0r[i] = m0r[i] + s * w2h
                m1r[i] = m1r[i] + s1 * (w2h * w1h)
                m2r[i] = m2r[i] + s2 * (w2h * w1h * w1h)
                t_ss = t_ss + sx_rows[i] * s
                t_sd = t_sd + sx_rows[i] * s1
                t_srd = t_srd + (sx_rows[i] * rho_rows[i]) * s1
                t_s = t_s + s
                t_d = t_d + s1
                t_wrd = t_wrd + wrho_rows[i] * s1
                t_wrd2 = t_wrd2 + wrho_rows[i] * s2
                t_wr2d2 = t_wr2d2 + (wrho_rows[i] * rho_rows[i]) * s2
            # One-body div term per particle: mu' rho + 2 mu.
            q_mu[h] = t_ss - w1h * t_wrd - 2.0 * (w * t_s)
            q_mu[d_mu + h] = w2h * (t_srd - 3.0 * t_wrd - w1h * t_wr2d2)
            q_mu[2 * d_mu + h] = w2h * (t_sd - w1h * t_wrd2 - 2.0 * (w * t_d))

        for i in range(n):
            rho = rho_rows[i]
            iv = 1.0 / rho
            xa, xb = xs[2 * i], xs[2 * i + 1]
            v[2 * i] = v[2 * i] + m0r[i] * xa
            v[2 * i + 1] = v[2 * i + 1] + m0r[i] * xb
            c1 = m1r[i] * iv
            cu = c1 * sx_rows[i]
            cg = (m2r[i] * rho + 3.0 * m1r[i]) * iv * w
            da[2 * i] = da[2 * i] - (cu * xa + m0r[i] * As[2 * i]) + cg * xa
            da[2 * i + 1] = (
                da[2 * i + 1] - (cu * xb + m0r[i] * As[2 * i + 1]) + cg * xb
            )

    return (
        jnp.concatenate(v, axis=0),
        jnp.concatenate(da, axis=0),
        q_eta,
        q_mu,
    )


def _reinforce_kernel(
    eta_w1, eta_b1, eta_w2, mu_w1, mu_b1, mu_w2,
    x_ref, a_ref, w_ref,
    out_qeta, out_qmu, out_z,
    *, steps, h, n, dim, d_eta, d_mu, tableau_name, sf,
):
    eta_refs = (eta_w1, eta_b1, eta_w2)
    mu_refs = None if mu_w1 is None else (mu_w1, mu_b1, mu_w2)
    tab = TABLEAUS[tableau_name]
    d = n * dim
    w = w_ref[:]
    rhs = functools.partial(
        _adjoint_rhs_and_sources, w=w, eta_refs=eta_refs, mu_refs=mu_refs,
        n=n, dim=dim, d_eta=d_eta, d_mu=d_mu, sf=sf,
    )

    n_qe = 3 * d_eta
    n_qm = 3 * d_mu if mu_refs is not None else 0

    def step(_, carry):
        x, a, qe, qm = carry
        ks = []
        qe_new, qm_new = qe, qm
        for i in range(tab.stages):
            if i:
                xi, ai = x, a
                for cj, kj in zip(tab.a[i], ks):
                    if cj != 0.0:
                        xi = xi + (h * cj) * kj[0]
                        ai = ai + (h * cj) * kj[1]
            else:
                xi, ai = x, a
            v_i, da_i, q_eta_i, q_mu_i = rhs(xi, ai)
            ks.append((v_i, da_i))
            bw = -h * tab.b[i]  # h < 0: positive quadrature weight
            if tab.b[i] != 0.0:
                qe_new = qe_new + bw * jnp.concatenate(q_eta_i, axis=0)
                if mu_refs is not None:
                    qm_new = qm_new + bw * jnp.concatenate(q_mu_i, axis=0)
        x_new, a_new = x, a
        for bj, kj in zip(tab.b, ks):
            if bj != 0.0:
                x_new = x_new + (h * bj) * kj[0]
                a_new = a_new + (h * bj) * kj[1]
        return (x_new, a_new, qe_new, qm_new)

    B = x_ref.shape[-1]
    qe0 = jnp.zeros((n_qe * sf, B), jnp.float32)
    qm0 = jnp.zeros((max(n_qm, 1) * sf, B), jnp.float32)
    x, a, qe, qm = jax.lax.fori_loop(
        0, steps, step, (x_ref[:], a_ref[:], qe0, qm0)
    )
    # The theta rows accumulate across walker blocks into ONE revisited
    # output block (grid is sequential on TPU): (nq*sf, LW) in VMEM instead
    # of an (nq*sf, B_total) HBM-scale buffer, which blew the 16 MB scoped
    # VMEM limit at production batch.
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        out_qeta[:] = qe
        if out_qmu is not None:
            out_qmu[:] = qm

    @pl.when(jnp.logical_not(first))
    def _accum():
        out_qeta[:] = out_qeta[:] + qe
        if out_qmu is not None:
            out_qmu[:] = out_qmu[:] + qm

    out_z[:] = x


@functools.partial(
    jax.jit,
    static_argnames=("t0", "t1", "steps", "method", "block_walkers",
                     "interpret", "io_tiles"),
)
def reinforce_flow_grad_pallas(
    params: dict,
    x1: jax.Array,
    ghat: jax.Array,
    w: jax.Array,
    t0: float,
    t1: float,
    steps: int = 8,
    method: str = "dopri5",
    block_walkers: int | None = None,
    interpret: bool = False,
    io_tiles: bool = False,
):
    """grad_theta sum_i w_i log p_theta(x1_i), backflow field, float32/dim=2.

    Args:
      params: {"eta": {w1 (1,h), b1 (h,), w2 (h,1)}, optional "mu": same}.
      x1: (B, n, dim) generated samples (flow output at t1).
      ghat: (B, n*dim) grad_x log p at x1 (forward Hessian-flow output).
      w: (B,) REINFORCE weights ((Eloc - Ebar)/B, stopped).
      t0, t1, steps, method: the flow's fixed integration grid.
      io_tiles: x1 and ghat arrive as raw (d*8, B/8) sublane-major tiles
        (the Hessian-flow kernel's ``io_tiles`` outputs); w stays (B,)
        (its reshape to a tile is layout-preserving).  Requires the
        full-sublane layout (SF == 8) and no padding; z_back is returned
        as a raw tile block.

    Returns:
      (grads, z_back): grads pytree shaped like ``params``; z_back (B, n, dim)
      is the backward-reconstructed base point (diagnostic; ~z up to the
      grid's reversibility error).
    """
    if io_tiles:
        dim = 2
        d = x1.shape[0] // 8
        n = d // dim
        B = x1.shape[1] * 8
    else:
        B, n, dim = x1.shape
        d = n * dim
    stages = TABLEAUS[method].stages
    eta = params["eta"]
    mu = params.get("mu")
    d_eta = eta["w1"].shape[1]
    d_mu = mu["w1"].shape[1] if mu is not None else 0
    nq = 3 * d_eta + (3 * d_mu if mu is not None else 0)

    BW, SF, Bpad = reinforce_layout(B, n, dim, d_eta, d_mu, stages,
                                    block_walkers)
    h = (float(t0) - float(t1)) / steps  # backward
    if io_tiles:
        if SF != 8 or Bpad != B:
            raise ValueError(
                f"io_tiles requires the full-sublane layout (SF=8, no "
                f"padding); got SF={SF}, B={B}, Bpad={Bpad}"
            )
        LP = Bpad // SF
        x_cm = x1.astype(jnp.float32)
        w_cm = w.astype(jnp.float32).reshape(SF, LP)
        # a1 = -w * ghat, built tile-side: broadcast the w tile over the d
        # coordinate row-groups (layout-preserving, no transpose).
        a_cm = -jnp.tile(w_cm, (d, 1)) * ghat.astype(jnp.float32)
    else:
        a1 = -w[:, None] * ghat  # (B, d); zero on padded walkers
        if Bpad != B:
            x1 = jnp.pad(x1, ((0, Bpad - B), (0, 0), (0, 0)), mode="edge")
            a1 = jnp.pad(a1, ((0, Bpad - B), (0, 0)))
            w = jnp.pad(w, ((0, Bpad - B),))
        LP = Bpad // SF
        tile = lambda arr: arr.reshape(arr.shape[0] * SF, LP)
        x_cm = tile(x1.reshape(Bpad, d).T.astype(jnp.float32))
        a_cm = tile(a1.T.astype(jnp.float32))
        w_cm = tile(w.astype(jnp.float32)[None, :])

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    weight_args = [
        eta["w1"][0].astype(jnp.float32),
        eta["b1"].astype(jnp.float32),
        eta["w2"][:, 0].astype(jnp.float32),
    ]
    static = dict(steps=steps, h=h, n=n, dim=dim, d_eta=d_eta, d_mu=d_mu,
                  tableau_name=method, sf=SF)
    if mu is not None:
        weight_args += [
            mu["w1"][0].astype(jnp.float32),
            mu["b1"].astype(jnp.float32),
            mu["w2"][:, 0].astype(jnp.float32),
        ]
        weight_specs = [smem()] * 6
        kernel = functools.partial(_reinforce_kernel, **static)
    else:
        weight_specs = [smem()] * 3

        def kernel(ew1, eb1, ew2, x_ref, a_ref, w_ref, out_qeta, out_z):
            _reinforce_kernel(
                ew1, eb1, ew2, None, None, None,
                x_ref, a_ref, w_ref, out_qeta, None, out_z, **static,
            )

    LW = BW // SF
    row_block = lambda rows: pl.BlockSpec(
        (rows * SF, LW), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    # Revisited accumulator block: every grid step maps to block (0, 0).
    acc_block = lambda rows: pl.BlockSpec(
        (rows * SF, LW), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    n_qe = 3 * d_eta
    n_qm = 3 * d_mu
    out_shapes = [jax.ShapeDtypeStruct((n_qe * SF, LW), jnp.float32)]
    out_specs = [acc_block(n_qe)]
    if mu is not None:
        out_shapes.append(jax.ShapeDtypeStruct((n_qm * SF, LW), jnp.float32))
        out_specs.append(acc_block(n_qm))
    out_shapes.append(jax.ShapeDtypeStruct((d * SF, LP), jnp.float32))
    out_specs.append(row_block(d))

    outs = pl.pallas_call(
        kernel,
        grid=(Bpad // BW,),
        out_shape=tuple(out_shapes),
        in_specs=weight_specs + [row_block(d), row_block(d), row_block(1)],
        out_specs=tuple(out_specs),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*weight_args, x_cm, a_cm, w_cm)

    untile = lambda arr, rows: arr.reshape(rows, Bpad)
    if mu is not None:
        qe_t, qm_t, z_t = outs
    else:
        qe_t, z_t = outs
    # q rows: (rows*SF, LW), already summed over walker blocks in-kernel;
    # finish the walker reduction over the remaining (SF, LW) tile.
    qe = jnp.sum(qe_t.reshape(n_qe, SF * LW), axis=1)
    grads = {
        "eta": {
            "w2": qe[:d_eta, None],
            "w1": qe[d_eta : 2 * d_eta][None, :],
            "b1": qe[2 * d_eta : 3 * d_eta],
        }
    }
    if mu is not None:
        qm = jnp.sum(qm_t.reshape(n_qm, SF * LW), axis=1)
        grads["mu"] = {
            "w2": qm[:d_mu, None],
            "w1": qm[d_mu : 2 * d_mu][None, :],
            "b1": qm[2 * d_mu : 3 * d_mu],
        }
    grads = jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype), grads,
        {"eta": eta, "mu": mu} if mu is not None else {"eta": eta},
    )
    if mu is None and "mu" in params:
        # Mirror the caller's pytree: the backflow params dict always
        # carries the "mu" key ("mu": None when the one-body net is off).
        grads["mu"] = None
    if io_tiles:
        return grads, z_t
    z_back = untile(z_t, d).T[:B].reshape(B, n, dim).astype(x1.dtype)
    return grads, z_back


def reinforce_flow_grad_pallas_sharded(
    mesh,
    params: dict,
    x1: jax.Array,
    ghat: jax.Array,
    w: jax.Array,
    t0: float,
    t1: float,
    steps: int = 8,
    method: str = "dopri5",
    interpret: bool = False,
    axis: str = "walkers",
):
    """``reinforce_flow_grad_pallas`` over a walker mesh.

    One kernel launch per shard via ``jax.shard_map``; the parameter
    gradient is a ``psum`` over the walker axis (the only collective the
    training step needs beyond the metric means).
    """
    from jax.sharding import PartitionSpec as P

    def local(params_l, x_l, g_l, w_l):
        grads, z = reinforce_flow_grad_pallas(
            params_l, x_l, g_l, w_l, t0, t1,
            steps=steps, method=method, interpret=interpret,
        )
        grads = jax.lax.psum(grads, axis)
        return grads, z

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(axis)),
        check_vma=False,
    )(params, x1, ghat, w)
