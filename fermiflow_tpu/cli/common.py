"""Shared CLI plumbing: flag definitions and model builders.

The reference duplicates its argparse block between the two drivers
(``src/FermionHO2D.py:15-32``, ``src/BetaFermionHO2D.py:15-35``); here both
CLIs share one flag set bound to the Config dataclass.
"""

from __future__ import annotations

import argparse

import jax

from fermiflow_tpu.config import Config
from fermiflow_tpu.flow import CNF
from fermiflow_tpu.nn import backflow_init_zeros
from fermiflow_tpu.nn.backflow import backflow_apply, backflow_divergence
from fermiflow_tpu.nn.backflow_derivs import backflow_field_tensors
from fermiflow_tpu.physics import (
    HO2D,
    CoulombPairPotential,
    FreeFermion,
    HOPotential,
)
from fermiflow_tpu.vmc import BetaVMC, GSVMC


def add_flags(parser: argparse.ArgumentParser, finite_t: bool):
    d = Config()
    # Reference-compatible flags (src/FermionHO2D.py:18-30).
    parser.add_argument("--nup", type=int, default=d.nup)
    parser.add_argument("--ndown", type=int, default=d.ndown)
    parser.add_argument("--Z", type=float, default=d.Z)
    parser.add_argument("--Deta", type=int, default=d.d_eta)
    parser.add_argument("--nomu", action="store_true")
    parser.add_argument("--Dmu", type=int, default=d.d_mu)
    parser.add_argument("--t0", type=float, default=d.t0)
    parser.add_argument("--t1", type=float, default=d.t1)
    parser.add_argument("--iternum", type=int, default=d.iternum)
    parser.add_argument("--batch", type=int, default=d.batch)
    if finite_t:
        parser.add_argument("--beta", type=float, default=d.beta)
        parser.add_argument("--deltaE", type=float, default=d.deltaE)
        parser.add_argument("--boltzmann", action="store_true")
    # TPU-native extensions.
    parser.add_argument("--lr", type=float, default=d.lr)
    parser.add_argument("--ode-steps", type=int, default=d.ode_steps)
    parser.add_argument("--ode-method", type=str, default=d.ode_method)
    parser.add_argument("--dtype", type=str, default=d.dtype,
                        choices=["float64", "float32"])
    parser.add_argument("--seed", type=int, default=d.seed)
    parser.add_argument("--equilibrium-steps", type=int,
                        default=d.equilibrium_steps)
    parser.add_argument("--mcmc-steps", type=int, default=d.mcmc_steps)
    parser.add_argument("--tau", type=float, default=d.tau)
    parser.add_argument("--persistent", action="store_true",
                        help="persistent walkers + per-walker tau adaptation")
    parser.add_argument("--shard", action="store_true",
                        help="shard walkers over all visible devices")
    parser.add_argument("--checkpoint-dir", type=str, default=None)
    parser.add_argument("--max-restarts", type=int, default=d.max_restarts,
                        help="automatic recovery: on a non-finite energy, "
                             "restore the latest checkpoint with reseeded "
                             "chains, up to N times (requires "
                             "--checkpoint-dir)")
    parser.add_argument("--checkpoint-every", type=int, default=d.checkpoint_every)
    parser.add_argument("--divergence-window", type=int,
                        default=d.divergence_window,
                        help="trailing healthy-iteration window for the "
                             "divergence watchdog (0 disables)")
    parser.add_argument("--divergence-nsigma", type=float,
                        default=d.divergence_nsigma,
                        help="restore when the energy exceeds the window "
                             "mean by this many window standard deviations "
                             "(finite-divergence watchdog; <=0 disables)")
    parser.add_argument("--ode-solver", type=str, default=d.ode_solver,
                        choices=["fixed", "adaptive", "adjoint"],
                        help="generative-flow integrator: fixed-grid scan "
                             "(production; discretize-then-optimize), "
                             "adaptive dopri5 (reference tolerance parity, "
                             "rtol/atol below), or the O(1)-memory adjoint")
    parser.add_argument("--rtol", type=float, default=d.rtol,
                        help="adaptive-solver relative tolerance "
                             "(reference: 1e-6)")
    parser.add_argument("--atol", type=float, default=d.atol,
                        help="adaptive-solver absolute tolerance "
                             "(reference: 1e-8)")
    parser.add_argument("--metrics", type=str, default=None,
                        help="jsonl metrics output path")
    parser.add_argument("--movie", type=str, default=None,
                        help="after training, dump density-movie trajectory "
                             "frames (.npy) to this path")
    parser.add_argument("--movie-frames", type=int, default=50)
    parser.add_argument("--movie-walkers", type=int, default=2000)
    parser.add_argument("--no-pallas-sampler", action="store_true",
                        help="disable the fused TPU Metropolis kernel")
    parser.add_argument("--no-pallas-reinforce", action="store_true",
                        help="compute the REINFORCE gradient by autodiff "
                             "through the reverse-ODE logp instead of the "
                             "fused adjoint kernel")
    parser.add_argument("--no-pallas-local-energy", action="store_true",
                        help="disable the fused TPU Hessian-flow kernel")
    parser.add_argument("--local-energy", type=str, default=d.local_energy,
                        choices=["auto", "hessian_flow", "nested_jvp"],
                        help="local-energy engine: forward Hessian flow "
                             "(closed-form field derivatives) or nested-jvp "
                             "Laplacian through the reverse ODE")
    parser.add_argument("--steps-per-call", type=int, default=d.steps_per_call,
                        help="iterations scanned inside one compiled program "
                             "(amortizes per-dispatch latency; metrics stay "
                             "per-iteration). Pick a divisor of "
                             "--checkpoint-every.")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a jax.profiler trace of iterations 2-4 "
                             "(or of the second program dispatch when "
                             "--steps-per-call > 1) into this directory")
    parser.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans (numerical sanitizer)")
    # Multi-host bring-up (jax.distributed); on a pod slice every host runs
    # the same command with its own --process-id.  --batch stays the GLOBAL
    # walker count; each process materializes only its shard.
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address host:port for "
                             "jax.distributed.initialize (multi-host)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--init-timeout", type=int, default=120,
                        help="jax.distributed.initialize barrier timeout "
                             "(seconds) — covers process start-up skew at "
                             "multi-host bring-up")
    parser.add_argument("--pallas-interpret", action="store_true",
                        help="run the Pallas kernels in the TPU interpreter "
                             "on the CPU backend (test/CI path; the "
                             "Metropolis kernel is excluded because "
                             "interpret mode stubs its on-core PRNG)")


def run_training_loop(state, start_step, cfg, args, make_step, logger,
                      primary, print_row, make_chunk=None):
    """Drive training from ``start_step`` to ``cfg.iternum``.

    With ``cfg.steps_per_call == 1`` this is the classic one-dispatch-per-
    iteration loop (reference semantics, ``src/FermionHO2D.py:66-76``).  With
    K > 1 it scans K iterations inside one compiled program
    (``train.make_multi_step``) and fetches the stacked per-iteration metrics
    once per dispatch — chunk boundaries are clipped to the checkpoint cadence
    so ``--checkpoint-every`` stays exact.

    ``make_step(jit)`` must return the (jitted or raw) train step;
    ``print_row(rec)`` renders one reference-format stdout line.

    Failure recovery (absent in the reference — a crash loses the run):
    with ``--max-restarts N`` and a checkpoint dir, a non-finite primary
    metric (NaN/inf step) OR a finite divergence — the energy jumping
    ``divergence_nsigma`` window-sigmas above the trailing
    ``divergence_window``-iteration mean, or the per-walker std exploding
    10x over the window median (an lr spike trains to garbage while staying
    finite) — triggers an automatic restore of the latest checkpoint with a
    perturbed RNG key, up to N times.  All processes of a multi-process run
    see the same replicated metric and restart together.
    """
    import math as _math
    import time as _time

    from fermiflow_tpu.train import make_multi_step
    from fermiflow_tpu.utils import restore_checkpoint, save_checkpoint, trace

    restarts = [0]
    mkey = None  # primary-metric key, bound on the first record seen
    window = []  # (metric, metric_std) of the trailing healthy iterations

    def _bad(recs):
        nonlocal mkey
        mkey = "F" if "F" in recs[0] else "E"
        for r in recs:
            if not _math.isfinite(float(r[mkey])):
                return f"non-finite energy ({mkey}={float(r[mkey])})"
        return _diverged(recs)

    def _diverged(recs):
        """Finite-divergence check against the trailing healthy window."""
        if (cfg.divergence_nsigma <= 0 or cfg.divergence_window <= 0
                or len(window) < cfg.divergence_window):
            return None
        vals = [w[0] for w in window]
        stds = sorted(w[1] for w in window)
        m = sum(vals) / len(vals)
        var = sum((v - m) ** 2 for v in vals) / len(vals)
        # Sigma floor: a fully converged window can have ~zero scatter; a
        # relative floor keeps the threshold meaningful there.
        s = max(var ** 0.5, 1e-3 * max(abs(m), 1.0))
        smed = stds[len(stds) // 2]
        for r in recs:
            v = float(r[mkey])
            if v > m + cfg.divergence_nsigma * s:
                return (
                    f"divergence ({mkey}={v:.6g} > window mean {m:.6g} + "
                    f"{cfg.divergence_nsigma:g} x sigma {s:.3g})"
                )
            vs = float(r.get(mkey + "_std", 0.0))
            if smed > 0 and _math.isfinite(vs) and vs > 10.0 * smed:
                return (
                    f"divergence ({mkey}_std={vs:.6g} > 10 x window "
                    f"median {smed:.6g})"
                )
        return None

    def _note_healthy(recs):
        if cfg.divergence_window <= 0:
            return  # divergence check disabled; don't grow the window
        for r in recs:
            window.append(
                (float(r[mkey]), float(r.get(mkey + "_std", 0.0)))
            )
        del window[: -cfg.divergence_window]

    def _recover(state, at_iter, reason):
        if not cfg.checkpoint_dir or restarts[0] >= cfg.max_restarts:
            raise FloatingPointError(
                f"{reason} at iteration {at_iter}"
                + ("" if cfg.checkpoint_dir else " (no --checkpoint-dir)")
                + (f"; {restarts[0]}/{cfg.max_restarts} restarts used")
            )
        restarts[0] += 1
        state, step = restore_checkpoint(cfg.checkpoint_dir, state)
        if step == 0:
            # No checkpoint written yet: restore_checkpoint returned the
            # (already-diverged) input state unchanged.  Continuing would
            # keep training from garbage while re-logging step numbers.
            raise FloatingPointError(
                f"{reason} at iteration {at_iter} before the first "
                f"checkpoint was written (nothing to restore)"
            )
        # Perturb the stream so the retried trajectory diverges from the
        # one that blew up; the trailing window restarts from the restored
        # point (its statistics described the pre-divergence trajectory).
        import jax as _jax

        state = state._replace(
            key=_jax.random.fold_in(state.key, 7919 + restarts[0])
        )
        window.clear()
        if primary:
            print(
                f"WATCHDOG: {reason} at iteration {at_iter}; "
                f"restored checkpoint step {step} with reseeded chains "
                f"(restart {restarts[0]}/{cfg.max_restarts})"
            )
        return state, step

    K = max(1, int(cfg.steps_per_call))
    if K == 1:
        step_fn = make_step(True)
        profiling = None
        i = start_step
        try:
            while i < cfg.iternum:
                i += 1
                if args.profile_dir and i == 2:
                    profiling = trace(args.profile_dir)
                    profiling.__enter__()
                state, metrics = step_fn(state)
                rec = logger.log(i, metrics)
                if profiling is not None and i == 4:
                    import numpy as _np

                    _np.asarray(metrics["E"])  # flush device work into trace
                    profiling.__exit__(None, None, None)
                    profiling = None
                reason = _bad([rec])
                if reason:
                    state, i = _recover(state, i, reason)
                    continue
                _note_healthy([rec])
                if primary:
                    print_row(rec)
                if cfg.checkpoint_dir and i % cfg.checkpoint_every == 0:
                    save_checkpoint(cfg.checkpoint_dir, i, state)
        finally:
            if profiling is not None:  # iternum < 4 or mid-loop exception
                profiling.__exit__(None, None, None)
        return state

    raw_step = None if make_chunk else make_step(False)
    compiled = {}  # chunk length -> jitted multi-step program
    i = start_step
    dispatch = 0
    while i < cfg.iternum:
        chunk = min(K, cfg.iternum - i)
        if cfg.checkpoint_dir:
            chunk = min(chunk, cfg.checkpoint_every - i % cfg.checkpoint_every)
        fn = compiled.get(chunk)
        if fn is None:
            # ``make_chunk`` (when the CLI provides one) builds a fused
            # whole-chunk program — e.g. the GS multi-chain-sampler
            # multi-step — instead of scanning the per-iteration step.
            fn = compiled[chunk] = (
                make_chunk(chunk) if make_chunk
                else make_multi_step(raw_step, chunk)
            )
        dispatch += 1
        profiling = None
        if args.profile_dir and dispatch == 2:
            profiling = trace(args.profile_dir)
            profiling.__enter__()
        t0 = _time.time()
        state, stacked = fn(state)
        rows = logger.log_many(i + 1, stacked, t0)  # fetch = device sync
        if profiling is not None:
            profiling.__exit__(None, None, None)
        reason = _bad(rows)
        if reason:
            state, i = _recover(state, i + chunk, reason)
            continue
        _note_healthy(rows)
        if primary:
            for rec in rows:
                print_row(rec)
        i += chunk
        if cfg.checkpoint_dir and i % cfg.checkpoint_every == 0:
            save_checkpoint(cfg.checkpoint_dir, i, state)
    return state


def maybe_init_distributed(args) -> bool:
    """Initialize the multi-process runtime (before any jax computation) and
    return whether this process is the primary (rank 0) one.

    Multi-process runs imply walker sharding over the global device mesh, so
    ``--shard`` is forced on.
    """
    from fermiflow_tpu.parallel.mesh import init_distributed

    multi = init_distributed(
        args.coordinator, args.num_processes, args.process_id,
        initialization_timeout=getattr(args, "init_timeout", 120),
    )
    if multi:
        args.shard = True
        print(
            f"jax.distributed: process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
    return jax.process_index() == 0


def config_from_args(args, finite_t: bool) -> Config:
    cfg = Config(
        nup=args.nup,
        ndown=args.ndown,
        Z=args.Z,
        d_eta=args.Deta,
        d_mu=None if args.nomu else args.Dmu,
        t0=args.t0,
        t1=args.t1,
        iternum=args.iternum,
        batch=args.batch,
        lr=args.lr,
        ode_steps=args.ode_steps,
        ode_method=args.ode_method,
        dtype=args.dtype,
        seed=args.seed,
        equilibrium_steps=args.equilibrium_steps,
        mcmc_steps=args.mcmc_steps,
        tau=args.tau,
        persistent_walkers=args.persistent,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        metrics_path=args.metrics,
        local_energy=args.local_energy,
        steps_per_call=args.steps_per_call,
        max_restarts=args.max_restarts,
        divergence_window=args.divergence_window,
        divergence_nsigma=args.divergence_nsigma,
        ode_solver=args.ode_solver,
        rtol=args.rtol,
        atol=args.atol,
    )
    if finite_t:
        cfg.beta = args.beta
        cfg.deltaE = args.deltaE
        cfg.boltzmann = args.boltzmann
    cfg.pallas_sampler = (
        not args.no_pallas_sampler
        and cfg.dtype == "float32"
        and jax.default_backend() == "tpu"
    )
    cfg.pallas_local_energy = (
        not args.no_pallas_local_energy
        and cfg.dtype == "float32"
        and cfg.local_energy in ("auto", "hessian_flow")
        and jax.default_backend() == "tpu"
    )
    cfg.pallas_reinforce = not args.no_pallas_reinforce
    if getattr(args, "pallas_interpret", False):
        # CI path: exercise the fused Hessian-flow kernel (deterministic; the
        # Metropolis kernel stays off — interpret mode stubs prng_random_bits
        # to zeros, which would corrupt sampling).
        cfg.pallas_interpret = True
        cfg.pallas_local_energy = (
            not args.no_pallas_local_energy
            and cfg.dtype == "float32"
            and cfg.local_energy in ("auto", "hessian_flow")
        )
    return cfg


def setup_precision(cfg: Config, debug_nans: bool = False):
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
    if cfg.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
        if jax.default_backend() == "tpu":
            # TPU has no native f64 (LU/slogdet reject it); run the f64
            # request on the host CPU backend instead of crashing.
            cpus = jax.devices("cpu")
            jax.config.update("jax_default_device", cpus[0])
            print(
                "NOTE: float64 requested on a TPU backend — falling back to "
                "CPU devices (use --dtype float32 for the TPU chip)."
            )


def make_cnf(cfg: Config) -> CNF:
    return CNF(
        velocity=backflow_apply,
        divergence=backflow_divergence,
        field_tensors=backflow_field_tensors,
        t0=cfg.t0,
        t1=cfg.t1,
        steps=cfg.ode_steps,
        method=cfg.ode_method,
        solver=cfg.ode_solver,
        rtol=cfg.rtol,
        atol=cfg.atol,
    )


def build_gs(cfg: Config):
    orbitals = HO2D()
    basedist = FreeFermion(orbitals)
    model = GSVMC(
        cfg.nup,
        cfg.ndown,
        basedist,
        make_cnf(cfg),
        CoulombPairPotential(cfg.Z),
        HOPotential(),
        laplacian_chunk=cfg.laplacian_chunk,
    )
    params = backflow_init_zeros(cfg.d_eta, cfg.d_mu, dtype=cfg.jnp_dtype())
    return model, params


def build_beta(cfg: Config):
    orbitals = HO2D()
    basedist = FreeFermion(orbitals)
    model = BetaVMC(
        cfg.beta,
        cfg.nup,
        cfg.ndown,
        cfg.deltaE,
        orbitals,
        basedist,
        make_cnf(cfg),
        CoulombPairPotential(cfg.Z),
        HOPotential(),
        laplacian_chunk=cfg.laplacian_chunk,
    )
    dtype = cfg.jnp_dtype()
    params = {
        "flow": backflow_init_zeros(cfg.d_eta, cfg.d_mu, dtype=dtype),
        "log_state_weights": model.init_log_state_weights(
            cfg.boltzmann,
            key=None if cfg.boltzmann else jax.random.PRNGKey(cfg.seed + 7),
            dtype=dtype,
        ),
    }
    return model, params


def dump_density_movie(path, model, flow_params, key, nframes, nwalkers,
                       cfg: Config, state_logits=None):
    """Save generative-flow trajectory frames for density movies.

    Capability of the reference's ``nframes`` path (``src/flow.py:46-48``,
    ``src/VMC.py:89-105``, used to render README's density2D.gif): frames of
    shape (nframes, nwalkers, n, dim) saved as .npy.
    """
    import numpy as np

    import jax.numpy as jnp

    dtype = cfg.jnp_dtype()
    k_state, k_base = jax.random.split(key)
    if state_logits is not None:
        state_idx = jax.random.categorical(
            k_state, state_logits, shape=(nwalkers,)
        )
        occ_table = jnp.asarray(model.occ_table)
        z = model.basedist.sample_multstates(
            occ_table, state_idx, k_base,
            equilibrium_steps=cfg.equilibrium_steps, tau=cfg.tau, dtype=dtype,
        )
    else:
        z = model.basedist.sample(
            model.occ_up, model.occ_down, k_base, (nwalkers,),
            equilibrium_steps=cfg.equilibrium_steps, tau=cfg.tau, dtype=dtype,
        )
    frames = model.cnf.generate_trajectory(flow_params, z, nframes)
    np.save(path, np.asarray(frames))
    print(f"density movie: saved {nframes} frames x {nwalkers} walkers to {path}")
