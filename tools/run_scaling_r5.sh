#!/bin/bash
# Round-5 multi-seed autodecoder instance-scaling study (VERDICT r4 next #1).
# Sequential TPU runs: seeds {0,1,2} x n {2,4,6}, fixed dataset (data-seed 0),
# then per-instance diagnosis of every cell at the anomaly's n=4 plus one
# n=2/n=6 contrast cell per seed-0.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/aonerf_jax_cache
cd /root/repo
OUT=studies/instance_scaling_r5.jsonl
mkdir -p studies

for seed in 0 1 2; do
  for n in 2 4 6; do
    echo "=== autodecoder n=$n seed=$seed ==="
    timeout 2400 python tools/instance_scaling_study.py \
      --mode autodecoder --n "$n" --seed "$seed" --val-views 30 \
      --out "$OUT" || echo "RUN FAILED n=$n seed=$seed"
  done
done

for seed in 0 1 2; do
  echo "=== diagnose n=4 seed=$seed ==="
  timeout 1200 python tools/diagnose_autodecoder.py --n 4 --seed "$seed" \
    --out "studies/diag_n4_s${seed}.json" || echo "DIAG FAILED seed=$seed"
done
timeout 1200 python tools/diagnose_autodecoder.py --n 2 --seed 0 \
  --out studies/diag_n2_s0.json || echo "DIAG FAILED n2"
timeout 1200 python tools/diagnose_autodecoder.py --n 6 --seed 0 \
  --out studies/diag_n6_s0.json || echo "DIAG FAILED n6"
echo "ALL DONE"
