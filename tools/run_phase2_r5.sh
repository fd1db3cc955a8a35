#!/bin/bash
# Round-5 phase 2 TPU studies:
#  A) VERDICT r4 next #6 — AE encode-reuse R=2 at EQUAL WALL-CLOCK:
#     1.49x the ray budget (the measured R=2/R=1 throughput ratio at the
#     quality preset) with the LR horizon stretched to match.
#  B) VERDICT r4 next #5 — articulated modes at the reference's view count
#     (4 instances x 10 articulations x 100 views @ 320x240 ≈ 1.2 GB of
#     device-resident buffers on ONE chip), throughput + held-out quality.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/aonerf_jax_cache
cd /root/repo
mkdir -p studies

echo "=== A) encode-reuse R=2 equal wall-clock (n=2) ==="
timeout 2400 python tools/instance_scaling_study.py \
  --mode ae --n 2 --ae-encode-reuse 2 --budget-rays 9.76e6 \
  --lr-horizon-scale 1.49 --tag _r2wc --val-views 30 \
  --out studies/ae_r2_wallclock_r5.jsonl || echo "RUN FAILED r2wc"
# e0 control re-run at R=1 on the same dataset/seed for a same-session pair
timeout 2400 python tools/instance_scaling_study.py \
  --mode ae --n 2 --val-views 30 --tag _e0ctl \
  --out studies/ae_r2_wallclock_r5.jsonl || echo "RUN FAILED e0ctl"

echo "=== B) reference-scale view count (n=4, 100 views) ==="
timeout 4500 python tools/instance_scaling_study.py \
  --mode autodecoder --n 4 --n-images 100 --val-views 30 \
  --out studies/ref_scale_views_r5.jsonl || echo "RUN FAILED refscale-ad"
timeout 4500 python tools/instance_scaling_study.py \
  --mode ae --n 4 --n-images 100 --val-views 30 \
  --out studies/ref_scale_views_r5.jsonl || echo "RUN FAILED refscale-ae"
echo "PHASE2 DONE"
