#!/bin/bash
# Round-3 our-side convergence queue (TPU; strictly sequential — only one
# process may hold the chip).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/conv_r3_ours
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

run mslr_Naive_ours 20 0 /tmp/mslr_data 10000 NaiveAlgorithm
run mslr_IPW_ours   20 0 /tmp/mslr_data 10000 IPWrank
run mslr_PDGD_ours  20 0 /tmp/mslr_data 10000 PDGD
run mgd_s0_ours 24 0 /tmp/conv_data 600 MGD
run mgd_s1_ours 24 1 /tmp/conv_data 600 MGD
run mgd_s2_ours 24 2 /tmp/conv_data 600 MGD
run yahoo_DLA_ours  20 0 /tmp/yahoo_data 10000 DLA
run yahoo_PDGD_ours 20 0 /tmp/yahoo_data 10000 PDGD
echo "queue complete $(date +%T)" >> "$OUT/queue.log"
