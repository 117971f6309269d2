#!/bin/bash
# Finite-T Fermi-liquid -> Wigner-molecule crossover sweep (round 4).
#
# The reference's paper claims span the finite-temperature crossover
# (/root/reference/README.md:22-40); the GS crossover table
# (docs/VALIDATION.md) covers the T=0 axis.  This sweep trains the
# finite-T flagship config (beta=2, N=6 polarized, deltaE=2 -> 54 states,
# Boltzmann init) across Z in {0.5, 1, 2, 4, 8} under the r3/r4 production
# protocol: persistent adapted-tau chains, steps-per-call 10, fused Pallas
# kernels, 3000 iters @ lr 3e-3 + 1000 polish @ 1e-3.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo

run () {  # run <Z> <tag>
  Z=$1; tag=$2
  ck=validation/ck/beta_n6_${tag}_r4
  common="--beta 2.0 --nup 6 --Z $Z --deltaE 2.0 --boltzmann \
    --batch 8192 --dtype float32 --persistent --mcmc-steps 30 \
    --steps-per-call 10 --checkpoint-every 500 --checkpoint-dir $ck --seed 42"
  echo "=== Z=$Z train ==="
  timeout 3000 python -m fermiflow_tpu.cli.finite_t $common \
    --iternum 3000 --lr 3e-3 \
    --metrics validation/runs/beta_n6_${tag}_r4.jsonl \
    > /tmp/beta_sweep_${tag}.log 2>&1
  echo "rc=$? (train)"
  echo "=== Z=$Z polish ==="
  timeout 3000 python -m fermiflow_tpu.cli.finite_t $common \
    --iternum 4000 --lr 1e-3 \
    --metrics validation/runs/beta_n6_${tag}_r4_polish.jsonl \
    > /tmp/beta_sweep_${tag}_polish.log 2>&1
  echo "rc=$? (polish)"
}

run 0.5 z05
run 1.0 z10
run 2.0 z20
run 4.0 z40
run 8.0 z80
echo "SWEEP DONE"
