#!/bin/bash
# Round-5 flagship re-run at ode_steps=4 (VERDICT r4 item #6): confirm the
# training trajectory before flipping Config.ode_steps 8 -> 4.  The error
# study (validation/runs/ode_steps_n6.json) already shows |dE| ~ 8e-10 and
# gradient rel-err 1.6e-8 at trained params — tighter than the reference's
# own adaptive envelope (rtol 1e-6, src/NeuralODE/nnModule.py:161-162);
# this run checks the full coupled optimization lands on the same optimum
# as the r3/r4 ode8 flagship (E = 18.160-18.163 at batch 8192).
# Also the first production run of the round-5 tile-chained kernel path.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
ck=validation/ck/gs_n6_z05_r5_ode4
common="--nup 6 --Z 0.5 --batch 8192 --dtype float32 --persistent \
  --mcmc-steps 30 --steps-per-call 10 --ode-steps 4 \
  --checkpoint-every 500 --checkpoint-dir $ck --seed 42"
echo "=== train (3000 @ 3e-3) ==="
timeout 6000 python -u -m fermiflow_tpu.cli.ground_state $common \
  --iternum 3000 --lr 3e-3 \
  --metrics validation/runs/gs_n6_z05_r5_ode4.jsonl \
  > /tmp/gs_ode4_train.log 2>&1
echo "rc=$? train"
tail -1 /tmp/gs_ode4_train.log
echo "=== polish (1000 @ 1e-3) ==="
timeout 6000 python -u -m fermiflow_tpu.cli.ground_state $common \
  --iternum 4000 --lr 1e-3 \
  --metrics validation/runs/gs_n6_z05_r5_ode4_polish.jsonl \
  > /tmp/gs_ode4_polish.log 2>&1
echo "rc=$? polish"
tail -1 /tmp/gs_ode4_polish.log
echo "FLAGSHIP ODE4 DONE"
