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
# refscale autodecoder rerun: the phase-2 invocation's exp_name collided
# with the phase-1 12-view run dir and auto-resumed its (collapsed, fully
# trained) checkpoint instead of training on the 100-view dataset; exp_name
# now carries a _v{n_images} tag
timeout 4500 python tools/instance_scaling_study.py \
  --mode autodecoder --n 4 --n-images 100 --val-views 30 \
  --out studies/ref_scale_views_r5.jsonl || echo "RUN FAILED refscale-ad2"

# clean-wall-clock rerun of the R=2 equal-wall-clock cell (the phase-2 run's
# fit_s was polluted by the concurrently-running CPU test suite)
timeout 2400 python tools/instance_scaling_study.py \
  --mode ae --n 2 --ae-encode-reuse 2 --budget-rays 9.76e6 \
  --lr-horizon-scale 1.49 --tag _r2wc2 --val-views 30 \
  --out studies/ae_r2_wallclock_r5.jsonl || echo "RUN FAILED r2wc2"
echo "PHASE3 DONE"
