#!/bin/bash
# Round-4 ad-hoc seed-extension runs (provenance for the BASELINE r4
# tables beyond run_r4_{ref,ours}_queue.sh and run_r4_cpu_queue2.sh):
#   * reference IPWrank seeds 0-2 at MSLR shape; ours seeds 0-5 (TPU);
#   * ours IPW/RegressionEM/PRSrank at regenerated Yahoo shape;
#   * the product-path driver runs (window amortization rows).
# Datasets: tools/make_toy_data.py
#   /tmp/mslr_data  --queries 10000 --valid_queries 1000 --features 136 \
#                   --max_label 4 --min_docs 40 --max_docs 200
#   /tmp/yahoo_data --queries 10000 --valid_queries 1000 --features 700 \
#                   --max_label 4 --min_docs 10 --max_docs 30
#   /tmp/prod_data  --queries 20000 --valid_queries 1000 --features 136
set -u
cd "$(dirname "$0")/.."
export OMP_NUM_THREADS=1
OUT=/tmp/conv_r4
mkdir -p "$OUT"

for s in 0 1 2; do
  tag=mslr_IPW_ref_s$s
  [ -f "$OUT/$tag.done" ] && continue
  ULTRA_CONV_EVALS=20 ULTRA_CONV_SEED=$s timeout 14400 \
    python tools/compare_convergence.py ref /tmp/mslr_data 10000 IPWrank \
    > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
done
for s in 0 1 2 3 4 5; do
  tag=mslr_IPW_s$s
  [ -f "$OUT/$tag.done" ] && continue
  ULTRA_CONV_EVALS=20 ULTRA_CONV_SEED=$s timeout 7200 \
    python -u tools/compare_convergence.py ours /tmp/mslr_data 10000 IPWrank \
    > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
done
for a in IPWrank RegressionEM PRSrank; do
  tag=yahoo_${a}_ours
  [ -f "$OUT/$tag.done" ] && continue
  ULTRA_CONV_EVALS=20 ULTRA_CONV_SEED=0 timeout 7200 \
    python -u tools/compare_convergence.py ours /tmp/yahoo_data 10000 $a \
    > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
done
