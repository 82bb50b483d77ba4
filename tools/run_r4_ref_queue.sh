#!/bin/bash
# Round-4 reference-side at-scale queue: the two algorithms the r3
# scoreboard left behind (PRSrank -0.029, RegressionEM -0.015), re-run on
# the regenerated /tmp/mslr_data so both sides share one dataset.
set -u
cd "$(dirname "$0")/.."
export OMP_NUM_THREADS=1
OUT=/tmp/conv_r4
mkdir -p "$OUT"

run() {  # run <tag> <evals> <seed> <data> <steps> <algo>
  local tag=$1 evals=$2 seed=$3 data=$4 steps=$5 algo=$6
  if [ -f "$OUT/$tag.done" ]; then return; fi
  echo "=== $tag start $(date +%T)" >> "$OUT/queue.log"
  ULTRA_CONV_EVALS=$evals ULTRA_CONV_SEED=$seed \
    timeout 14400 python tools/compare_convergence.py ref "$data" "$steps" "$algo" \
    > "$OUT/$tag.log" 2>&1
  echo "rc=$? $(date +%T)" >> "$OUT/queue.log"
  touch "$OUT/$tag.done"
}

run mslr_PRS_ref 20 0 /tmp/mslr_data 10000 PRSrank
run mslr_REM_ref 20 0 /tmp/mslr_data 10000 RegressionEM
echo "queue complete $(date +%T)" >> "$OUT/queue.log"
