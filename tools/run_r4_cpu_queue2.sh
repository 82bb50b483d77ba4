#!/bin/bash
# Round-4 follow-on CPU queue (runs after run_r4_ref_queue.sh finishes):
#   1. reference PRSrank seeds 1-2 at MSLR shape (seed-spread evidence);
#   2. MGD multi-seed study on the r3 toy protocol (VERDICT-r3 #6):
#      reference seeds 3-5 extend r3's 0-2 (make_toy_data is unchanged
#      since r3, so /tmp/conv_data regenerates bit-identically and the r3
#      numbers stay comparable); ours seeds 0-7 re-measured on current
#      code.
set -u
cd "$(dirname "$0")/.."
export OMP_NUM_THREADS=1
OUT=/tmp/conv_r4
mkdir -p "$OUT"

# wait for the first ref queue (REM) to release the CPU
while [ ! -f "$OUT/mslr_REM_ref.done" ]; do sleep 60; done

[ -d /tmp/conv_data ] || python tools/make_toy_data.py /tmp/conv_data --queries 400

run() {  # run <side> <tag> <evals> <seed> <data> <steps> <algo>
  local side=$1 tag=$2 evals=$3 seed=$4 data=$5 steps=$6 algo=$7
  if [ -f "$OUT/$tag.done" ]; then return; fi
  echo "=== $tag start $(date +%T)" >> "$OUT/queue2.log"
  ULTRA_CONV_EVALS=$evals ULTRA_CONV_SEED=$seed ULTRA_PLATFORM=cpu \
    timeout 14400 python -u tools/compare_convergence.py $side "$data" "$steps" "$algo" \
    > "$OUT/$tag.log" 2>&1
  echo "rc=$? $(date +%T)" >> "$OUT/queue2.log"
  touch "$OUT/$tag.done"
}

run ref mslr_PRS_ref_s1 20 1 /tmp/mslr_data 10000 PRSrank
run ref mslr_PRS_ref_s2 20 2 /tmp/mslr_data 10000 PRSrank
for s in 3 4 5; do
  run ref mgd_ref_s$s 24 $s /tmp/conv_data 600 MGD
done
for s in 0 1 2 3 4 5 6 7; do
  run ours mgd_ours_s$s 24 $s /tmp/conv_data 600 MGD
done
echo "queue2 complete $(date +%T)" >> "$OUT/queue2.log"
