#!/bin/bash
# Round-5 phase 3: seed-0 n=4 collapse recovery A/B (VERDICT r4 next #1,
# "fix" half). diag_n4_s0.json attributes the dip to a per-instance training
# collapse (instance 2: train PSNR 11.9 dB, shape-code norm 1.82 vs ~1.05).
# A/B: same seed/dataset with a 10x stronger code pull (code_reg 1e-3) —
# done = val_psnr recovers into the healthy band (~26.5+) and the diag shows
# instance 2 training normally.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/aonerf_jax_cache
cd /root/repo
mkdir -p studies

timeout 2400 python tools/instance_scaling_study.py \
  --mode autodecoder --n 4 --seed 0 --code-reg 1e-3 --tag _reg1e3 \
  --val-views 30 --out studies/instance_scaling_r5.jsonl \
  || echo "RUN FAILED reg1e3"
timeout 1200 python tools/diagnose_autodecoder.py --n 4 --seed 0 \
  --tag _reg1e3 --out studies/diag_n4_s0_reg1e3.json \
  || echo "DIAG FAILED reg1e3"
echo "PHASE3 DONE"
