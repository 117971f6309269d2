"""Mixed-state sampler throughput: where does the GS-vs-mixed gap live?

Round-4 VERDICT item #5 proposes sorting walkers by state so occupations
become block-static and each block can use the GS-style statically-unrolled
Slater build.  This study measures the decisive A/B first: the multistate
kernel's occupations are RUNTIME DATA, so one compiled program can run

  (a) the production mixed batch (random states from the N=6 deltaE=2
      table, 54 states),
  (b) the same batch SORTED by state (the proposal's data layout), and
  (c) every walker in the SAME state (the ground state) — occupation
      diversity zero, resolve mechanism still active,

and the GS kernel runs (d) the statically-unrolled build on identical
walkers.  The kernel is data-independent compute (mask-FMA sums, no
gather, no branch), so (a) == (b) == (c) within noise would prove the gap
vs (d) is the RESOLVE MECHANISM (2K-term mask-FMA per matrix entry),
not state diversity — and sorting cannot help without making occupations
compile-time static per block, which Mosaic's block granularity forbids
at production shapes: lane blocks must be multiples of 128 (=> walker
blocks of 1024) while 8192 walkers over 54 states average ~152
walkers/state, so single-state blocks would need ~54*1024 = 6.75x padding.

Usage (TPU): JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    python -u validation/ms_sampler_study.py --out validation/runs/ms_sampler_study.json
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fermiflow_tpu.ops.pallas_metropolis import (
    metropolis_free_fermion,
    metropolis_free_fermion_multistate,
)
from fermiflow_tpu.physics import HO2D

NUP, BATCH, STEPS, REPS = 6, 8192, 100, 400


def time_chain(run, key, x0):
    out = run(key, x0)
    np.asarray(jax.tree_util.tree_leaves(out)[-1])
    t0 = time.perf_counter()
    out = run(key, x0)
    np.asarray(jax.tree_util.tree_leaves(out)[-1])
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()

    orb = HO2D()
    occ_table, _ = orb.fermion_states(NUP, 0, 2.0)
    occ_table = np.asarray(occ_table)
    ks = int(max(np.max(orb.nx[occ_table]), np.max(orb.ny[occ_table]))) + 1
    nx_tab, ny_tab = np.asarray(orb.nx), np.asarray(orb.ny)

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (BATCH, NUP, 2), jnp.float32)
    idx = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (BATCH,), 0,
                           occ_table.shape[0])
    )

    def ms_runner(nx, ny):
        nx = jnp.asarray(nx, jnp.int32)
        ny = jnp.asarray(ny, jnp.int32)

        @jax.jit
        def run(key, x0):
            def body(i, carry):
                x, _ = carry
                seed = jax.random.randint(
                    jax.random.fold_in(key, i), (), 0, 2**31 - 1, jnp.int32)
                x2, _, acc = metropolis_free_fermion_multistate(
                    x, seed, 0.1, STEPS, nx, ny, ks)
                return x2, acc
            return jax.lax.fori_loop(
                0, REPS, body, (x0, jnp.zeros((BATCH,), jnp.float32)))
        return run

    results = {"config": f"N={NUP} B={BATCH} steps={STEPS} reps={REPS} "
                         f"deltaE=2 (54 states) kshells={ks}"}

    variants = {
        "mixed_random": idx,
        "mixed_sorted": np.sort(idx),
        "uniform_gs": np.zeros(BATCH, np.int64),
    }
    for name, ii in variants.items():
        occ = occ_table[ii]
        dt = time_chain(ms_runner(nx_tab[occ], ny_tab[occ]), key, x0)
        wps = BATCH * STEPS * REPS / dt
        results[name + "_wps"] = round(wps, 1)
        print(f"{name}: {wps:.4g} wps", flush=True)

    # GS kernel, statically unrolled build (same walkers).
    nx_occ = tuple(int(v) for v in nx_tab[occ_table[0]])
    ny_occ = tuple(int(v) for v in ny_tab[occ_table[0]])

    @jax.jit
    def run_gs(key, x0):
        def body(i, carry):
            x, _ = carry
            seed = jax.random.randint(
                jax.random.fold_in(key, i), (), 0, 2**31 - 1, jnp.int32)
            x2, _, acc = metropolis_free_fermion(
                x, seed, 0.1, STEPS, nx_occ, ny_occ, ks)
            return x2, acc
        return jax.lax.fori_loop(
            0, REPS, body, (x0, jnp.zeros((BATCH,), jnp.float32)))

    dt = time_chain(run_gs, key, x0)
    results["static_gs_wps"] = round(BATCH * STEPS * REPS / dt, 1)
    print(f"static_gs: {results['static_gs_wps']:.4g} wps", flush=True)

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
