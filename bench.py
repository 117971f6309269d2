"""Benchmark: MCMC walker throughput + full VMC train-step time on one chip.

Prints ONE JSON line:
  {"metric": "walker_steps_per_s_per_chip", "value": N, "unit": "walker-steps/s",
   "vs_baseline": R, ...extras}

Headline metric (BASELINE.json): Metropolis walker-steps/s/chip at N=6 —
batch x equilibration-steps per wall-second for the Slater base-density
sampler, the sampling hot loop of every training iteration (reference
``src/base_dist.py:58-71``: 100 steps/iteration at batch 8000).

vs_baseline: ratio against the reference implementation (torch, float64)
measured on this machine's CPU for the identical workload (62,500
walker-steps/s at N=6; the reference repo publishes no GPU numbers —
BASELINE.md).  Extras report the full train-step time (sample + local energy
+ gradient + Adam) which has no reference counterpart measurable here
(torchdiffeq is not installed and the reference's scipy path is
host-sequential).

Runs in float32 on TPU (no native f64); the float64 correctness gates live in
tests/ on the CPU backend.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Reference torch-f64 CPU throughput for the identical sampler workload,
# measured on this machine (see BASELINE.md provenance).
REFERENCE_WALKER_STEPS_PER_S = 62_500.0

NUP = 6
BATCH = 8192
MCMC_STEPS = 100


def main():
    import optax

    from fermiflow_tpu import mcmc
    from fermiflow_tpu.config import Config
    from fermiflow_tpu.physics import HO2D, FreeFermion
    from fermiflow_tpu.train import init_gs_state, make_gs_train_step
    from __graft_entry__ import _build

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.float32 if on_tpu else jnp.float64

    orb = HO2D()
    bd = FreeFermion(orb)
    occ = np.arange(NUP, dtype=np.int32)

    if on_tpu:
        # Production sampler: fused Pallas Metropolis kernel.
        from fermiflow_tpu.ops.pallas_metropolis import metropolis_free_fermion

        nx_occ = tuple(int(v) for v in orb.nx[occ])
        ny_occ = tuple(int(v) for v in orb.ny[occ])

        def run_mcmc(key, x0):
            seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
            x, _, acc = metropolis_free_fermion(
                x0, seed, 0.1, MCMC_STEPS, nx_occ, ny_occ
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
    # so per-call wall timing of eager dispatches is meaningless.  REPS is
    # large enough to amortize the ~40 ms fixed program-launch overhead down
    # to noise (the marginal chain cost is ~2 ms).
    REPS = 50

    @jax.jit
    def run_epochs(key, x0):
        def body(i, carry):
            x, _ = carry
            return run_mcmc(jax.random.fold_in(key, i), x)

        return jax.lax.fori_loop(
            0, REPS, body, (x0, jnp.zeros((BATCH,), dtype))
        )

    x, acc = run_epochs(key, x0)
    np.asarray(acc)  # compile + warmup
    t0 = time.perf_counter()
    x, acc = run_epochs(jax.random.fold_in(key, 123), x)
    np.asarray(acc)
    dt = (time.perf_counter() - t0) / REPS
    walker_steps_per_s = BATCH * MCMC_STEPS / dt

    # Full train step (sample + local energy + grad + Adam) timing.
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
    state = init_gs_state(model, params, cfg, optimizer)
    raw_step = make_gs_train_step(model, optimizer, cfg, jit=False)
    REPS2 = 5

    @jax.jit
    def multi_step(state):
        def body(s, _):
            s2, m = raw_step(s)
            return s2, m["E"]
        return jax.lax.scan(body, state, None, length=REPS2)

    state, Es = multi_step(state)
    np.asarray(Es)  # compile + warmup
    t0 = time.perf_counter()
    state, Es = multi_step(state)
    np.asarray(Es)
    step_s = (time.perf_counter() - t0) / REPS2
    metrics = {"E": Es[-1]}

    print(
        json.dumps(
            {
                "metric": "walker_steps_per_s_per_chip",
                "value": round(walker_steps_per_s, 1),
                "unit": "walker-steps/s",
                "vs_baseline": round(
                    walker_steps_per_s / REFERENCE_WALKER_STEPS_PER_S, 2
                ),
                "config": f"N={NUP} batch={BATCH} mcmc_steps={MCMC_STEPS}",
                "accept_rate": round(float(jnp.mean(acc)), 3),
                "train_step_seconds": round(step_s, 4),
                "train_hours_per_100_iters": round(step_s * 100 / 3600, 5),
                "train_E": float(metrics["E"]),
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
