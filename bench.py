"""Benchmark: sampler throughput + full VMC train-step time on one chip.

Prints ONE JSON line:
  {"metric": "walker_steps_per_s_per_chip", "value": N, "unit": "walker-steps/s",
   "vs_baseline": R, ...extras}

Headline metric (BASELINE.json): Metropolis walker-steps/s/chip at N=6 —
batch x chain-steps per wall-second for the Slater base-density sampler, the
sampling hot loop of every training iteration (reference
``src/base_dist.py:58-71``: 100 steps/iteration at batch 8000).

vs_baseline: ratio against the reference implementation (torch, float64)
measured on this machine's CPU for the identical workload (62,500
walker-steps/s at N=6; the reference repo publishes no GPU numbers —
BASELINE.md).

Driver robustness (the r4 lesson — BENCH_r04.json recorded rc=124/null):
  * The compilation cache is SELF-CONFIGURED at import; the driver's
    environment does not set JAX_COMPILATION_CACHE_DIR, and without the
    cache the fused production programs recompile cold (~25 min each,
    CLAUDE.md) and the run cannot finish.
  * A wall-clock budget (BENCH_BUDGET_S, default 1200 s) is enforced by a
    watchdog thread: whatever happens — a cold compile, a wedged remote
    helper — the headline JSON line is printed with every field measured so
    far and the process exits 0.
  * Mandatory continuity rows (r1-r4 comparable) run first; the expensive
    optional rows (fused production, ode4, N=10, isolated kernels) run only
    while budget remains, and are skipped wholesale if the first compile
    reveals a cold cache.

Extras:
  * marginal/sustained split + fixed program-dispatch overhead (the tunnel
    costs ~30 ms per jit program launch on this host; inside a program the
    marginal chain cost at batch 8192 is ~0.4 ms per 100 steps);
  * mixed-state (finite-T) sampler throughput;
  * GS and finite-T full train-step times (sample + local energy + gradient
    + Adam in one jit), classic protocol and the shipped production
    protocol (persistent chains, steps-per-call 10, fused multichain
    sampler);
  * roofline: hand-counted FLOPs per walker-step (see _sampler_flops) and
    per Hessian-flow stage (_hflow_flops) -> achieved GFLOP/s and fraction
    of the v5e VPU peak.  Both Pallas kernels are VPU-compute-bound by
    design: state lives in VMEM for the whole chain/solve, so HBM traffic is
    one read + one write per LAUNCH (bandwidth_util ~ 0).

Runs in float32 on TPU (no native f64); the float64 correctness gates live in
tests/ on the CPU backend.
"""

import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

# --- driver robustness: self-configured compile cache --------------------
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)

_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))

# Reference torch-f64 CPU throughput for the identical sampler workload,
# measured on this machine (see BASELINE.md provenance).
REFERENCE_WALKER_STEPS_PER_S = 62_500.0

# v5e per-chip peaks (jax-ml.github.io/scaling-book): MXU 197 TFLOP/s bf16;
# the sampler/Hessian-flow kernels run on the VPU (elementwise f32):
# 8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz.
VPU_PEAK_FLOPS = 8 * 128 * 4 * 0.94e9  # ~3.85e12
HBM_BYTES_PER_S = 819e9

NUP = 6
BATCH = 8192
MCMC_STEPS = 100
_ON_TPU = jax.devices()[0].platform == "tpu"
# Chains per timed program: enough that the fixed ~30 ms program-dispatch
# latency of this tunneled platform is amortized below ~10% — the headline
# "sustained" rate then reflects the production configuration, where the
# sampler shares one program with K scanned training iterations
# (--steps-per-call) rather than paying a launch per chain.  (The CPU
# fallback path runs the scan sampler ~3 orders of magnitude slower, so it
# keeps small rep counts — the bench's numbers of record are TPU-only.)
REPS = 1000 if _ON_TPU else 5
# Training iterations scanned per program in the timed train step — the
# shipped production mode (train.make_multi_step / --steps-per-call).
TRAIN_REPS = 20 if _ON_TPU else 3

# The single JSON line the driver parses.  Filled incrementally so the
# watchdog can always emit something well-formed.
FIELDS = {
    "metric": "walker_steps_per_s_per_chip",
    "value": None,
    "unit": "walker-steps/s",
    "vs_baseline": None,
}
_EMITTED = threading.Event()


def _emit(truncated=None):
    if _EMITTED.is_set():
        return
    _EMITTED.set()
    out = dict(FIELDS)
    if truncated:
        out["bench_truncated"] = truncated
    out["bench_elapsed_s"] = round(time.monotonic() - _T0, 1)
    out["platform"] = jax.devices()[0].platform
    print(json.dumps(out), flush=True)


def _watchdog():
    _note("BUDGET EXHAUSTED — emitting partial results")
    _emit(truncated="budget_exhausted")
    os._exit(0)


def _left():
    return BUDGET_S - (time.monotonic() - _T0)


def _note(msg):
    print(f"[bench {time.monotonic() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _section(name, need_s, fn):
    """Run an optional section if enough budget remains; never raise."""
    if _left() < need_s:
        FIELDS.setdefault("skipped", []).append(name)
        _note(f"skip {name}: {_left():.0f}s left < {need_s}s needed")
        return
    _note(f"start {name}")
    try:
        fn()
        _note(f"done {name}")
    except Exception as e:  # noqa: BLE001 — a broken row must not kill the run
        FIELDS.setdefault("errors", {})[name] = repr(e)[:200]
        _note(f"ERROR in {name}: {e!r}")


def _sampler_flops(n: int, K: int, dim: int = 2) -> float:
    """Hand-counted flop-equivalents per walker-step of the fused Metropolis
    kernel (ops/pallas_metropolis.py), spin-polarized variant.

    Per step and walker, with d = n*dim:
      proposal x+tau*noise          : 2d
      Box-Muller (d normals)        : d/2 pairs x (log+sqrt+cos+sin ~ 4x8
                                      flop-equivalents + 3 mults) ~ 17.5d
      PRNG bit plumbing (d+1 words) : ~4(d+1)
      Hermite tables (2 dims x n)   : 2n(4(K-2)+1)
      Gaussian prefactor (exp ~ 8)  : 12n
      Slater matrix build           : 2n^2
      pivoted GE (selects+MACs)     : ~1.5n^3 + 8n (log per pivot)
      accept (exp + selects)        : d + 12
    """
    d = n * dim
    return (
        2 * d + 17.5 * d + 4 * (d + 1)
        + 2 * n * (4 * max(K - 2, 0) + 1) + 12 * n
        + 2 * n * n + 1.5 * n**3 + 8 * n + d + 12
    )


# RHS evaluations per fixed-grid dopri5 step: the tableau in
# ode/integrators.py omits the zero-weight FSAL 7th stage, so the honest
# count is 6 (rounds 1-3 modeled 7, overstating kernel utilization ~17%).
DOPRI5_STAGES = 6


def _hflow_flops(n: int, d_eta: int, d_mu: int, dim: int = 2) -> float:
    """Flop-equivalents per walker per RK STAGE of the fused Hessian-flow
    kernel (ops/pallas_hessian_flow.py).

    Dominant terms, d = n*dim, P = n(n-1)/2 pairs:
      pair MLP (4 derivative orders, hidden loop): P x d_eta x ~14
      one-body MLP                                : n x d_mu x ~14
      field tensors (A, gdiv, S, T assembly)      : ~8 d^2 + 20 P
      dH/dt = -S - T - (A H + H A), packed sym    : ~4 d^3  (2 MACs x
                                                    d(d+1)/2 x 2d entries)
      dg/dt, dlogp/dt, RK combine                 : ~2 d^2 + 10 d
    """
    d = n * dim
    P = n * (n - 1) // 2
    mlp = P * d_eta * 14 + (n * d_mu * 14 if d_mu else 0)
    return mlp + 8 * d * d + 20 * P + 4 * d**3 + 2 * d * d + 10 * d


def _fetch(x):
    return np.asarray(x)


def _time_reps(run, *args):
    out = run(*args)
    _fetch(jax.tree_util.tree_leaves(out)[-1])  # compile + warm
    t0 = time.perf_counter()
    out = run(*args)
    _fetch(jax.tree_util.tree_leaves(out)[-1])
    return time.perf_counter() - t0, out


def main():
    timer = threading.Timer(max(_left(), 1.0), _watchdog)
    timer.daemon = True
    timer.start()

    import optax

    from fermiflow_tpu import mcmc
    from fermiflow_tpu.cli import common
    from fermiflow_tpu.config import Config
    from fermiflow_tpu.physics import HO2D, FreeFermion
    from fermiflow_tpu.train import (
        init_beta_state,
        init_gs_state,
        make_beta_train_step,
        make_gs_fused_multi_step,
        make_gs_train_step,
        make_multi_step,
    )
    from __graft_entry__ import _build

    on_tpu = _ON_TPU
    dtype = jnp.float32 if on_tpu else jnp.float64

    orb = HO2D()
    bd = FreeFermion(orb)
    occ = np.arange(NUP, dtype=np.int32)
    nx_occ = tuple(int(v) for v in orb.nx[occ])
    ny_occ = tuple(int(v) for v in orb.ny[occ])
    kshells = int(max(nx_occ + ny_occ)) + 1

    if on_tpu:
        # Production sampler: fused Pallas Metropolis kernel.
        from fermiflow_tpu.ops.pallas_metropolis import (
            metropolis_free_fermion,
            metropolis_free_fermion_multistate,
        )

        def run_mcmc(key, x0):
            seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
            x, _, acc = metropolis_free_fermion(
                x0, seed, 0.1, MCMC_STEPS, nx_occ, ny_occ, kshells
            )
            return x, acc
    else:
        def run_mcmc(key, x0):
            state = mcmc.metropolis(
                lambda x: bd.log_prob(occ, (), x), key, x0, MCMC_STEPS, 0.1
            )
            return state.x, state.accept_rate

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (BATCH, NUP, 2), dtype=dtype)

    # Timing protocol: run REPS chained chains inside ONE jitted program and
    # fetch a value at the end.  Per-dispatch tunnel latency on remote TPU
    # platforms is O(100 ms) and block_until_ready does not reliably block,
    # so per-call wall timing of eager dispatches is meaningless.
    def make_epochs(reps):
        @jax.jit
        def run_epochs(key, x0):
            def body(i, carry):
                x, _ = carry
                return run_mcmc(jax.random.fold_in(key, i), x)

            return jax.lax.fori_loop(
                0, reps, body, (x0, jnp.zeros((BATCH,), dtype))
            )

        return run_epochs

    # ---- mandatory row 1: GS sampler (headline) -------------------------
    _note("start sampler (headline)")
    tc0 = time.monotonic()
    dt_total, (x, acc) = _time_reps(make_epochs(REPS), key, x0)
    first_compile_s = time.monotonic() - tc0 - dt_total
    # A cold cache announces itself on the very first program: with warm
    # cache this compile+warm is seconds to ~1 min (a warm FETCH through the
    # remote helper measured 59 s on a quiet host right after a reboot, so
    # the threshold needs headroom above that); cold it is minutes.  When
    # cold, skip every expensive optional row — the budget belongs to the
    # continuity rows.  A false-warm is the cheaper error: the optional rows
    # then eat budget compiling, and the watchdog still emits the JSON.
    cold_cache = first_compile_s > 150.0
    FIELDS["first_compile_s"] = round(first_compile_s, 1)
    if cold_cache:
        FIELDS["cold_cache"] = True
        _note(f"COLD CACHE detected (first compile {first_compile_s:.0f}s)")
    dt1, _ = _time_reps(make_epochs(1), jax.random.fold_in(key, 5), x0)
    dt = dt_total / REPS
    walker_steps_per_s = BATCH * MCMC_STEPS / dt
    # dt1 = overhead + 1 chain; dt_total = overhead + REPS chains.
    marginal_per_chain = (dt_total - dt1) / (REPS - 1)
    launch_overhead_s = max(dt1 - marginal_per_chain, 0.0)
    marginal_wps = BATCH * MCMC_STEPS / max(marginal_per_chain, 1e-9)

    sflops = _sampler_flops(NUP, kshells)
    sampler_gflops = walker_steps_per_s * sflops / 1e9

    FIELDS.update(
        value=round(walker_steps_per_s, 1),
        vs_baseline=round(walker_steps_per_s / REFERENCE_WALKER_STEPS_PER_S, 2),
        config=f"N={NUP} batch={BATCH} mcmc_steps={MCMC_STEPS}",
        accept_rate=round(float(jnp.mean(acc)), 3),
        sampler_marginal_wps=round(marginal_wps, 1),
        launch_overhead_ms=round(launch_overhead_s * 1e3, 2),
        sampler_flops_per_walker_step=round(sflops, 1),
        sampler_gflops=round(sampler_gflops, 1),
        sampler_vpu_util=round(sampler_gflops * 1e9 / VPU_PEAK_FLOPS, 4),
        sampler_marginal_vpu_util=round(
            marginal_wps * sflops / VPU_PEAK_FLOPS, 4
        ),
        # Sampler-kernel HBM traffic only (walker state in + out per chain
        # launch over the marginal chain time) — the kernels keep all state
        # in VMEM, so this is the kernel's entire HBM footprint, NOT a
        # whole-step roofline statement.
        sampler_hbm_rw_fraction=round(
            2 * BATCH * NUP * 2 * 4
            / max(marginal_per_chain, 1e-9) / HBM_BYTES_PER_S, 6
        ),
    )
    _note(f"sampler done: {walker_steps_per_s:.3g} wps")

    # ---- mandatory row 2: mixed-state (finite-T) sampler ----------------
    occ_table, _ = orb.fermion_states(NUP, 0, 2.0)
    idx = jax.random.randint(jax.random.PRNGKey(1), (BATCH,), 0,
                             occ_table.shape[0])
    occm = jnp.take(jnp.asarray(occ_table), idx, axis=0)
    nxm = jnp.take(jnp.asarray(orb.nx), occm)
    nym = jnp.take(jnp.asarray(orb.ny), occm)
    ms_kshells = int(
        max(np.max(np.asarray(orb.nx)[np.asarray(occ_table)]),
            np.max(np.asarray(orb.ny)[np.asarray(occ_table)]))
    ) + 1

    def mixed_state_row():
        if on_tpu:
            def run_mcmc_ms(key, x0):
                seed = jax.random.randint(key, (), 0, 2**31 - 1,
                                          dtype=jnp.int32)
                x, _, acc = metropolis_free_fermion_multistate(
                    x0, seed, 0.1, MCMC_STEPS, nxm, nym, ms_kshells
                )
                return x, acc
        else:
            def run_mcmc_ms(key, x0):
                state = mcmc.metropolis(
                    lambda x: bd.log_prob_multstates(
                        jnp.asarray(occ_table), idx, x
                    ),
                    key, x0, MCMC_STEPS, 0.1,
                )
                return state.x, state.accept_rate

        @jax.jit
        def run_epochs_ms(key, x0):
            def body(i, carry):
                x, _ = carry
                return run_mcmc_ms(jax.random.fold_in(key, i), x)

            return jax.lax.fori_loop(
                0, REPS, body, (x0, jnp.zeros((BATCH,), dtype))
            )

        dt_ms, (_, acc_ms) = _time_reps(run_epochs_ms, key, x0)
        FIELDS["mixed_state_wps"] = round(BATCH * MCMC_STEPS * REPS / dt_ms, 1)
        FIELDS["mixed_state_accept"] = round(float(jnp.mean(acc_ms)), 3)

    _section("mixed_state_sampler", 60, mixed_state_row)

    # ---- mandatory row 3: GS full train step (classic protocol) ---------
    # Protocol matches rounds 1-4 for comparability: NON-persistent, 100
    # equilibration steps per iteration, per-iteration scan.
    cfg = Config(
        nup=NUP,
        Z=0.5,
        batch=BATCH,
        ode_steps=8,
        equilibrium_steps=MCMC_STEPS,
        laplacian_chunk=512,
        lr=1e-3,  # stable training regime (1e-2 oscillates at N=6 f32)
        pallas_sampler=on_tpu,
        pallas_local_energy=on_tpu,
        dtype="float32" if on_tpu else "float64",
    )
    model, params = _build(
        dtype, nup=NUP, ode_steps=cfg.ode_steps, laplacian_chunk=512
    )
    optimizer = optax.adam(cfg.lr)
    # The timed programs donate their TrainState (production semantics),
    # which deletes the param buffers — give every init its own copy.
    params_host = jax.tree_util.tree_map(np.asarray, params)
    fresh_params = lambda: jax.tree_util.tree_map(jnp.asarray, params_host)

    def _time_multi_step(cfg, model, state, reps, fused, opt):
        """Per-iteration seconds of `reps` scanned iterations per program.

        fused=True uses the multi-chain-sampler program (ONE Metropolis
        launch per program, train.make_gs_fused_multi_step).  Keep `reps`
        at the production steps-per-call (10) there: each extra segment
        grows the unrolled Mosaic kernel, and a 20-segment variant measured
        >2 h of remote compile where the 10-segment production program
        compiles in ~25 min (and is shared with the CLI's cache entry).
        """
        if fused and on_tpu:
            fn = make_gs_fused_multi_step(model, opt, cfg, reps)
        else:
            raw_step = make_gs_train_step(model, opt, cfg, jit=False)

            @jax.jit
            def fn(state):
                def body(s, _):
                    s2, m = raw_step(s)
                    return s2, m
                return jax.lax.scan(body, state, None, length=reps)

        state, m = fn(state)
        _fetch(m["E"])  # compile + warmup (donation layout settles on 2)
        t0 = time.perf_counter()
        state, m = fn(state)
        Es = _fetch(m["E"])
        return (time.perf_counter() - t0) / reps, state, Es

    shared = {}

    def gs_classic_row():
        state = init_gs_state(model, fresh_params(), cfg, optimizer)
        step_s, state, Es = _time_multi_step(
            cfg, model, state, TRAIN_REPS, fused=False, opt=optimizer)
        FIELDS["train_step_seconds"] = round(step_s, 4)
        FIELDS["train_hours_per_100_iters"] = round(step_s * 100 / 3600, 5)
        FIELDS["train_E"] = float(np.asarray(Es)[-1])
        # Hessian-flow roofline for the train step: 6 RHS evals/step
        # (dopri5, FSAL stage omitted) x ode_steps; the step also pays
        # sampler + base VGH + the REINFORCE adjoint kernel, so this
        # numerator UNDERCOUNTS the step's useful work — kept as the
        # continuity metric vs r1-r3.
        hflops_step = (_hflow_flops(NUP, 50, 50) * DOPRI5_STAGES
                       * cfg.ode_steps * BATCH)
        train_gflops = hflops_step / step_s / 1e9
        FIELDS["train_gflops_est"] = round(train_gflops, 1)
        FIELDS["train_vpu_util_est"] = round(
            train_gflops * 1e9 / VPU_PEAK_FLOPS, 4)
        shared["gs_state"] = state

    _section("gs_classic_step", 60, gs_classic_row)

    # ---- mandatory row 4: finite-T full train step (classic protocol) ---
    def beta_classic_row():
        bcfg = Config(
            nup=NUP, Z=0.5, beta=2.0, deltaE=2.0, boltzmann=True,
            batch=BATCH, ode_steps=8, equilibrium_steps=MCMC_STEPS,
            laplacian_chunk=512, lr=1e-3, pallas_sampler=on_tpu,
            pallas_local_energy=on_tpu,
            dtype="float32" if on_tpu else "float64",
        )
        bmodel, bparams = common.build_beta(bcfg)
        bopt = optax.adam(bcfg.lr)
        bstate = init_beta_state(bmodel, bparams, bcfg, bopt)
        raw_bstep = make_beta_train_step(bmodel, bopt, bcfg, jit=False)

        @jax.jit
        def multi_bstep(state):
            def body(s, _):
                s2, m = raw_bstep(s)
                return s2, (m["F"], m["E"], m["S"])
            return jax.lax.scan(body, state, None, length=TRAIN_REPS)

        bstate, Fs = multi_bstep(bstate)
        _fetch(Fs[0])
        t0 = time.perf_counter()
        bstate, Fs = multi_bstep(bstate)
        _fetch(Fs[0])
        FIELDS["beta_step_seconds"] = round(
            (time.perf_counter() - t0) / TRAIN_REPS, 4)
        FIELDS["beta_F"] = float(_fetch(Fs[0])[-1])

    _section("beta_classic_step", 60, beta_classic_row)

    # ================= optional rows (budget-gated) ======================
    # Cold cache => each of these costs 10-30 min of remote Mosaic compile;
    # the gate effectively skips them all and the continuity rows above are
    # the round's record.
    big = 1e9 if cold_cache else 120.0

    # Production protocol row: persistent adapted-tau chains, 30 steps/iter,
    # steps-per-call 10, fused multi-chain sampler — the EXACT program the
    # CLI ships (lr 3e-3 matches the flagship run so the compile cache entry
    # is shared with it).
    PREPS = 10

    def gs_production_row():
        pcfg = Config(
            nup=NUP, Z=0.5, batch=BATCH, ode_steps=8, mcmc_steps=30,
            persistent_walkers=True, laplacian_chunk=512, lr=3e-3,
            steps_per_call=PREPS,
            pallas_sampler=on_tpu, pallas_local_energy=on_tpu,
            dtype="float32" if on_tpu else "float64",
        )
        popt = optax.adam(pcfg.lr)
        pstate = init_gs_state(model, fresh_params(), pcfg, popt)
        pstep_s, _, _ = _time_multi_step(
            pcfg, model, pstate, PREPS, fused=True, opt=popt)
        FIELDS["train_step_production_seconds"] = round(pstep_s, 4)

    if on_tpu:
        _section("gs_production_step", big, gs_production_row)

    # Finite-T production row (VERDICT r4 #4): persistent coupled-refresh
    # chains, 30 steps/iter, steps-per-call 10 — the exact program the
    # finite-T CLI ships (cli/common.py:288-291 -> make_multi_step) at its
    # DEFAULT config (ode_steps=4 since round 5, flagship-confirmed).
    def beta_production_row():
        pbcfg = Config(
            nup=NUP, Z=0.5, beta=2.0, deltaE=2.0, boltzmann=True,
            batch=BATCH, ode_steps=4, mcmc_steps=30,
            persistent_walkers=True, laplacian_chunk=512, lr=3e-3,
            steps_per_call=PREPS, pallas_sampler=on_tpu,
            pallas_local_energy=on_tpu,
            dtype="float32" if on_tpu else "float64",
        )
        pbmodel, pbparams = common.build_beta(pbcfg)
        pbopt = optax.adam(pbcfg.lr)
        pbstate = init_beta_state(pbmodel, pbparams, pbcfg, pbopt)
        fn = make_multi_step(
            make_beta_train_step(pbmodel, pbopt, pbcfg, jit=False), PREPS)
        pbstate, m = fn(pbstate)
        _fetch(m["F"])  # compile + warm (donation layout settles on 2)
        t0 = time.perf_counter()
        pbstate, m = fn(pbstate)
        _fetch(m["F"])
        FIELDS["beta_step_production_seconds"] = round(
            (time.perf_counter() - t0) / PREPS, 4)
        FIELDS["beta_production_ode_steps"] = pbcfg.ode_steps
        FIELDS["beta_production_F"] = float(_fetch(m["F"])[-1])

    if on_tpu:
        _section("beta_production_step", big, beta_production_row)

    # Reference-tolerance fast mode: ode_steps=4.  The trained-params error
    # study (validation/runs/ode_steps_n6.json) puts the 4-step grid at
    # |dE| ~ 8e-10 and gradient rel-err 1.6e-8 — five orders below MC noise
    # and TIGHTER than the reference's own adaptive tolerance envelope
    # (rtol 1e-6).
    def ode4_row():
        model4, _ = _build(dtype, nup=NUP, ode_steps=4, laplacian_chunk=512)
        popt = optax.adam(3e-3)
        p4cfg = Config(
            nup=NUP, Z=0.5, batch=BATCH, ode_steps=4, mcmc_steps=30,
            persistent_walkers=True, laplacian_chunk=512, lr=3e-3,
            steps_per_call=PREPS, pallas_sampler=True,
            pallas_local_energy=True, dtype="float32",
        )
        p4state = init_gs_state(model4, fresh_params(), p4cfg, popt)
        p4step_s, _, E4 = _time_multi_step(
            p4cfg, model4, p4state, PREPS, fused=True, opt=popt)
        FIELDS["train_step_production_ode4_seconds"] = round(p4step_s, 4)
        FIELDS["train_ode4_E"] = float(np.asarray(E4)[-1])

    if on_tpu:
        _section("ode4_production_step", big, ode4_row)

    # ---- isolated kernel timings (measured roofline, not estimates) -----
    d_eta, d_mu = 50, 50
    KR = 20

    def kernels_row():
        from fermiflow_tpu.ops.pallas_hessian_flow import hessian_flow_pallas
        from fermiflow_tpu.ops.pallas_reinforce import (
            reinforce_flow_grad_pallas,
        )
        from fermiflow_tpu.vmc.hessian_flow import base_val_grad_hess

        state = shared.get("gs_state")
        if state is None:
            state = init_gs_state(model, fresh_params(), cfg, optimizer)
        tparams = state.params
        z_eq = state.walkers
        y0k, g0k, H0k = jax.jit(
            lambda zz: base_val_grad_hess(
                lambda zs: bd.log_prob(occ, (), zs), zz)
        )(z_eq)

        @jax.jit
        def run_hflow(p, z, y0, g0, H0):
            def body(i, acc):
                x, lp, g, H = hessian_flow_pallas(
                    p, z, y0 + 0.0 * i, g0, H0, 0.0, 1.0,
                    steps=cfg.ode_steps, method="dopri5")
                return acc + lp.sum() + jnp.trace(
                    H, axis1=-2, axis2=-1).sum()
            return jax.lax.fori_loop(0, KR, body, jnp.zeros((), jnp.float32))

        dt_k, _ = _time_reps(run_hflow, tparams, z_eq, y0k, g0k, H0k)
        FIELDS["hflow_kernel_seconds"] = round(dt_k / KR, 5)
        hflops = (_hflow_flops(NUP, d_eta, d_mu) * DOPRI5_STAGES
                  * cfg.ode_steps * BATCH)
        FIELDS["hflow_kernel_vpu_util"] = round(
            hflops / (dt_k / KR) / VPU_PEAK_FLOPS, 4)

        xk, _, gk, _ = jax.jit(
            lambda p, z, y0, g0, H0: hessian_flow_pallas(
                p, z, y0, g0, H0, 0.0, 1.0, steps=cfg.ode_steps,
                method="dopri5")
        )(tparams, z_eq, y0k, g0k, H0k)
        wk = jax.random.normal(jax.random.PRNGKey(9), (BATCH,), dtype) / BATCH

        @jax.jit
        def run_reinforce(p, x, g, w):
            def body(i, acc):
                grads, _ = reinforce_flow_grad_pallas(
                    p, x, g, w + 0.0 * i, 0.0, 1.0,
                    steps=cfg.ode_steps, method="dopri5")
                return acc + sum(jnp.sum(l) for l in
                                 jax.tree_util.tree_leaves(grads))
            return jax.lax.fori_loop(0, KR, body, jnp.zeros((), jnp.float32))

        dt_r, _ = _time_reps(run_reinforce, tparams, xk, gk, wk)
        FIELDS["reinforce_kernel_seconds"] = round(dt_r / KR, 5)

    if on_tpu:
        _section("isolated_kernels", big, kernels_row)

    # ---- N=10 block (large-N scaling pinned by driver-captured JSON) ----
    def n10_row():
        from fermiflow_tpu.ops.pallas_hessian_flow import hessian_flow_pallas
        from fermiflow_tpu.ops.pallas_reinforce import (
            reinforce_flow_grad_pallas,
        )
        from fermiflow_tpu.vmc.hessian_flow import base_val_grad_hess

        N10, B10 = 10, 4096
        occ10 = np.arange(N10, dtype=np.int32)
        nx10 = tuple(int(v) for v in orb.nx[occ10])
        ny10 = tuple(int(v) for v in orb.ny[occ10])
        k10 = int(max(nx10 + ny10)) + 1
        x10 = jax.random.normal(jax.random.PRNGKey(2), (B10, N10, 2),
                                dtype=dtype)
        # 200 chains: the n10 in-program chain is only ~0.6 ms/chain, so
        # the ~30 ms program dispatch needs this many reps to amortize
        # below ~3% (a 50-rep variant measured 427M vs the true ~716M wps
        # — dispatch was 60% of the timed call).
        R10 = 200

        @jax.jit
        def run_mcmc10(key, x0):
            def body(i, carry):
                x, _ = carry
                seed = jax.random.randint(
                    jax.random.fold_in(key, i), (), 0, 2**31 - 1,
                    dtype=jnp.int32)
                x2, _, acc = metropolis_free_fermion(
                    x, seed, 0.1, MCMC_STEPS, nx10, ny10, k10)
                return x2, acc
            return jax.lax.fori_loop(
                0, R10, body, (x0, jnp.zeros((B10,), dtype)))

        dt10, (x10eq, acc10) = _time_reps(run_mcmc10, key, x10)
        FIELDS["n10_sampler_wps"] = round(B10 * MCMC_STEPS * R10 / dt10, 1)
        FIELDS["n10_sampler_accept"] = round(float(jnp.mean(acc10)), 3)

        model10, params10 = _build(dtype, nup=N10, ode_steps=8,
                                   laplacian_chunk=512)
        cfg10 = Config(
            nup=N10, Z=0.5, batch=B10, ode_steps=8, mcmc_steps=30,
            persistent_walkers=True, laplacian_chunk=512, lr=1e-3,
            pallas_sampler=True, pallas_local_energy=True, dtype="float32",
        )
        tp10 = jax.tree_util.tree_map(
            lambda x: 5e-2 * jax.random.normal(
                jax.random.PRNGKey(7), x.shape, x.dtype), params10)
        bd10 = FreeFermion(orb)
        y10, g10, H10 = jax.jit(
            lambda zz: base_val_grad_hess(
                lambda zs: bd10.log_prob(occ10, (), zs), zz)
        )(x10eq)

        @jax.jit
        def run_hflow10(p, z, y0, g0, H0):
            def body(i, acc):
                x, lp, g, H = hessian_flow_pallas(
                    p, z, y0 + 0.0 * i, g0, H0, 0.0, 1.0,
                    steps=8, method="dopri5")
                return acc + lp.sum() + jnp.trace(
                    H, axis1=-2, axis2=-1).sum()
            return jax.lax.fori_loop(0, KR, body, jnp.zeros((), jnp.float32))

        dt_k10, _ = _time_reps(run_hflow10, tp10, x10eq, y10, g10, H10)
        FIELDS["n10_hflow_kernel_seconds"] = round(dt_k10 / KR, 5)
        hflops10 = _hflow_flops(N10, d_eta, d_mu) * DOPRI5_STAGES * 8 * B10
        FIELDS["n10_hflow_kernel_vpu_util"] = round(
            hflops10 / (dt_k10 / KR) / VPU_PEAK_FLOPS, 4)

        xk10, _, gk10, _ = hessian_flow_pallas(
            tp10, x10eq, y10, g10, H10, 0.0, 1.0, steps=8, method="dopri5")
        wk10 = jax.random.normal(jax.random.PRNGKey(9), (B10,), dtype) / B10

        @jax.jit
        def run_reinforce10(p, x, g, w):
            def body(i, acc):
                grads, _ = reinforce_flow_grad_pallas(
                    p, x, g, w + 0.0 * i, 0.0, 1.0, steps=8,
                    method="dopri5")
                return acc + sum(jnp.sum(l) for l in
                                 jax.tree_util.tree_leaves(grads))
            return jax.lax.fori_loop(0, KR, body, jnp.zeros((), jnp.float32))

        dt_r10, _ = _time_reps(run_reinforce10, tp10, xk10, gk10, wk10)
        FIELDS["n10_reinforce_kernel_seconds"] = round(dt_r10 / KR, 5)

        # Classic per-iteration scan (persistent 30-step protocol): the
        # fused n=10 multichain kernel would be another half-hour Mosaic
        # compile for a row whose purpose is pinning large-N scaling.
        state10 = init_gs_state(model10, params10, cfg10, optimizer)
        pstep10_s, _, Es10 = _time_multi_step(
            cfg10, model10, state10, TRAIN_REPS, fused=False, opt=optimizer)
        FIELDS["n10_train_step_seconds"] = round(pstep10_s, 4)
        FIELDS["n10_train_E"] = float(np.asarray(Es10)[-1])

    if on_tpu:
        _section("n10_block", big, n10_row)

    timer.cancel()
    _emit()


if __name__ == "__main__":
    main()
