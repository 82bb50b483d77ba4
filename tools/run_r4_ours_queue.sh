#!/bin/bash
# Round-4 our-side at-scale queue (TPU; strictly sequential — one process
# owns the chip): 3 seeds each for the two r3 gap algorithms, now with the
# torch-exact Adagrad (algorithms/base.py:adagrad_torch).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/conv_r4_ours
mkdir -p "$OUT"

run() {  # run <tag> <evals> <seed> <data> <steps> <algo>
  local tag=$1 evals=$2 seed=$3 data=$4 steps=$5 algo=$6
  if [ -f "$OUT/$tag.done" ]; then return; fi
  echo "=== $tag start $(date +%T)" >> "$OUT/queue.log"
  ULTRA_CONV_EVALS=$evals ULTRA_CONV_SEED=$seed \
    timeout 7200 python -u tools/compare_convergence.py ours "$data" "$steps" "$algo" \
    > "$OUT/$tag.log" 2>&1
  echo "rc=$? $(date +%T)" >> "$OUT/queue.log"
  touch "$OUT/$tag.done"
}

run mslr_PRS_s0 20 0 /tmp/mslr_data 10000 PRSrank
run mslr_PRS_s1 20 1 /tmp/mslr_data 10000 PRSrank
run mslr_PRS_s2 20 2 /tmp/mslr_data 10000 PRSrank
run mslr_REM_s0 20 0 /tmp/mslr_data 10000 RegressionEM
run mslr_REM_s1 20 1 /tmp/mslr_data 10000 RegressionEM
run mslr_REM_s2 20 2 /tmp/mslr_data 10000 RegressionEM
echo "queue complete $(date +%T)" >> "$OUT/queue.log"
