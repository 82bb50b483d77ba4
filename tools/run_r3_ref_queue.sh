#!/bin/bash
# Round-3 reference-side convergence queue (VERDICT r2 #1/#2).
# Runs sequentially with one thread so the interactive core stays free.
set -u
cd "$(dirname "$0")/.."
export OMP_NUM_THREADS=1
OUT=/tmp/conv_r3
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

# Headline: full 10k-iteration protocol at MSLR-WEB10K shape.
run mslr_DLA_ref   20 0 /tmp/mslr_data 10000 DLA
run mslr_Naive_ref 20 0 /tmp/mslr_data 10000 NaiveAlgorithm
run mslr_IPW_ref   20 0 /tmp/mslr_data 10000 IPWrank
run mslr_PDGD_ref  20 0 /tmp/mslr_data 10000 PDGD
# MGD multi-seed on the toy protocol (VERDICT r2 weak #1), peak-tracked.
run mgd_s0_ref 24 0 /tmp/conv_data 600 MGD
run mgd_s1_ref 24 1 /tmp/conv_data 600 MGD
run mgd_s2_ref 24 2 /tmp/conv_data 600 MGD
# Yahoo shape (700 features).
run yahoo_DLA_ref  20 0 /tmp/yahoo_data 10000 DLA
run yahoo_PDGD_ref 20 0 /tmp/yahoo_data 10000 PDGD
echo "queue complete $(date +%T)" >> "$OUT/queue.log"
