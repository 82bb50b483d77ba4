#!/bin/bash
# Round-3 follow-up queue: waits for the first queue on its side to finish,
# then runs (a) ours-IPW at MSLR with the regenerated 40-position
# propensity table, (b) PDGD at scale under the reference's ONLINE
# protocol (ULTRA_CONV_FEED=stochastic) on both sides — the reference's
# offline PDGD config crashes out of the box when lists exceed the cutoff.
# Usage: run_r3_queue2.sh {ref|ours}
set -u
cd "$(dirname "$0")/.."
SIDE=$1
OUT=/tmp/conv_r3$([ "$SIDE" = ours ] && echo _ours)
mkdir -p "$OUT"

until grep -q "queue complete" "$OUT/queue.log" 2>/dev/null; do sleep 60; done

run() {  # run <tag> <feed> <evals> <seed> <data> <steps> <algo>
  local tag=$1 feed=$2 evals=$3 seed=$4 data=$5 steps=$6 algo=$7
  if [ -f "$OUT/$tag.done" ]; then return; fi
  echo "=== $tag start $(date +%T)" >> "$OUT/queue.log"
  ULTRA_CONV_FEED=$feed ULTRA_CONV_EVALS=$evals ULTRA_CONV_SEED=$seed \
    OMP_NUM_THREADS=1 \
    timeout 14400 python -u tools/compare_convergence.py "$SIDE" "$data" "$steps" "$algo" \
    > "$OUT/$tag.log" 2>&1
  echo "rc=$? $(date +%T)" >> "$OUT/queue.log"
  touch "$OUT/$tag.done"
}

if [ "$SIDE" = ours ]; then
  run mslr_IPW2_ours click 20 0 /tmp/mslr_data 10000 IPWrank
fi
run mslr_PDGDo_$SIDE stochastic 20 0 /tmp/mslr_data 10000 PDGD
run yahoo_PDGDo_$SIDE stochastic 20 0 /tmp/yahoo_data 10000 PDGD
echo "queue2 complete $(date +%T)" >> "$OUT/queue.log"
