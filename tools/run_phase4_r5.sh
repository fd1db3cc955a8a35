#!/bin/bash
# Round-5 phase 4: seed the AE cells of the instance-scaling table (they
# were single-seed; the re-stated round-5 headline compares seeded
# autodecoder numbers against them). Seed 0 rows exist from round 4 and
# reproduce deterministically; add seeds 1/2 per n.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/aonerf_jax_cache
cd /root/repo
for seed in 1 2; do
  for n in 2 4 6; do
    echo "=== ae n=$n seed=$seed ==="
    timeout 2400 python tools/instance_scaling_study.py \
      --mode ae --n "$n" --seed "$seed" --val-views 30 \
      --out studies/instance_scaling_r5.jsonl || echo "RUN FAILED ae n=$n s=$seed"
  done
done
echo "PHASE4 DONE"
