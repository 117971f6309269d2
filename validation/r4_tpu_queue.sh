#!/bin/bash
# Round-4 TPU measurement queue — run AFTER the crossover sweep frees the
# chip (serialize all TPU work; concurrent clients contend on the tunnel).
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo

echo "=== 1. z10 polish re-run (was killed mid-compile) ==="
timeout 3600 python -u -m fermiflow_tpu.cli.finite_t \
  --beta 2.0 --nup 6 --Z 1.0 --deltaE 2.0 --boltzmann \
  --batch 8192 --dtype float32 --persistent --mcmc-steps 30 \
  --steps-per-call 10 --checkpoint-every 500 \
  --checkpoint-dir validation/ck/beta_n6_z10_r4 --seed 42 \
  --iternum 4000 --lr 1e-3 \
  --metrics validation/runs/beta_n6_z10_r4_polish.jsonl \
  > /tmp/q_z10_polish.log 2>&1
echo "rc=$?"

echo "=== 2. TPU-gated kernel tests (direct, no CPU-pinning conftest) ==="
FERMIFLOW_TPU_TESTS=1 timeout 3600 python -u -m pytest \
  tests/test_pallas_metropolis.py -q \
  -k "chain_acceptance or sampler_moments or multistate_kernel_chain or awkward_batch_chain or multichain_kernel_chain" \
  > /tmp/q_tpu_tests.log 2>&1
echo "rc=$? (see /tmp/q_tpu_tests.log)"

echo "=== 3. bench.py (BENCH_r04 preview) ==="
timeout 5400 python -u bench.py > /tmp/q_bench.log 2>&1
echo "rc=$?"
tail -1 /tmp/q_bench.log

echo "=== 4. roofline (production persistent protocol) ==="
timeout 5400 python -u validation/roofline_train.py \
  --out validation/runs/roofline_train_r4.json --skip-xla-engine \
  > /tmp/q_roofline.log 2>&1
echo "rc=$?"

echo "=== 5. adaptive-vs-fixed A/B at trained params ==="
timeout 3600 python -u validation/ode_solver_ab.py \
  --out validation/runs/ode_solver_ab.json > /tmp/q_odeab.log 2>&1
echo "rc=$?"

echo "=== 6. GS fused-multi-step flagship sanity (N=6, 600 iters) ==="
timeout 3600 python -u -m fermiflow_tpu.cli.ground_state \
  --nup 6 --Z 0.5 --batch 8192 --dtype float32 \
  --persistent --mcmc-steps 30 --steps-per-call 10 --lr 3e-3 \
  --iternum 600 --seed 42 \
  --metrics validation/runs/gs_n6_z05_r4_fused.jsonl \
  > /tmp/q_gs_fused.log 2>&1
echo "rc=$?"
tail -2 /tmp/q_gs_fused.log

echo "QUEUE DONE"
