#!/bin/bash
# Provenance for the r5 UBM seed-extension + optimizer-dynamics runs
# (BASELINE.md "r5: non-PBM at-scale campaign" section). Assumes the r4
# MSLR-shaped files exist (regenerate with:
#   python tools/make_toy_data.py /tmp/mslr_data --queries 10000 \
#     --valid_queries 1000 --features 136 --max_label 4 \
#     --min_docs 40 --max_docs 200).
# Only ONE process may hold the TPU; the "ours" loops are TPU jobs.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/conv_r5
mkdir -p "$OUT"
UBM=/root/reference/example/ClickModel/ubm_0.1_1_4_1.0.json

# ours, default true Adagrad, seeds 1-11 (seed 0 comes from
# run_r5_ours_queue.sh as mslr_DLA_ubm_ours.log)
for s in 1 2 3 4 5 6 7 8 9 10 11; do
  tag=mslr_DLA_ubm_ours_s$s
  [ -f "$OUT/$tag.done" ] && continue
  ULTRA_CONV_EVALS=20 ULTRA_CONV_SEED=$s ULTRA_CONV_CLICK_JSON=$UBM \
    timeout 1200 python -u tools/compare_convergence.py ours \
    /tmp/mslr_data 10000 DLA > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
done

# ours, reference-matched optimizer dynamics (grad_strategy=ada_reset),
# seeds 0-2
for s in 0 1 2; do
  tag=mslr_DLA_ubm_ours_reset_s$s
  [ -f "$OUT/$tag.done" ] && continue
  ULTRA_CONV_EVALS=20 ULTRA_CONV_SEED=$s ULTRA_CONV_CLICK_JSON=$UBM \
    ULTRA_CONV_ALGO_EXTRA="grad_strategy=ada_reset" \
    timeout 1200 python -u tools/compare_convergence.py ours \
    /tmp/mslr_data 10000 DLA > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
done

# ours, ada_reset under PBM (the instability probe cited in BASELINE.md)
tag=mslr_DLA_pbm_ours_reset_s0
if [ ! -f "$OUT/$tag.done" ]; then
  ULTRA_CONV_EVALS=20 ULTRA_CONV_SEED=0 \
    ULTRA_CONV_ALGO_EXTRA="grad_strategy=ada_reset" \
    timeout 1200 python -u tools/compare_convergence.py ours \
    /tmp/mslr_data 10000 DLA > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
fi

# reference, UBM seeds 1-2 (seed 0 comes from run_r5_ref_queue.sh);
# CPU jobs, ~25 min each
export OMP_NUM_THREADS=1
for s in 1 2; do
  tag=mslr_DLA_ubm_ref_s$s
  [ -f "$OUT/$tag.done" ] && continue
  ULTRA_CONV_EVALS=20 ULTRA_CONV_SEED=$s ULTRA_CONV_CLICK_JSON=$UBM \
    timeout 7200 python tools/compare_convergence.py ref \
    /tmp/mslr_data 10000 DLA > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
done

# cascade 3v3 extension (seed 0 comes from the main queues)
CAS=/root/reference/example/ClickModel/cascade_0.1_1.0_4_1.0.json
for s in 1 2; do
  tag=mslr_Naive_cascade_ours_s$s
  [ -f "$OUT/$tag.done" ] && continue
  ULTRA_CONV_EVALS=10 ULTRA_CONV_SEED=$s ULTRA_CONV_CLICK_JSON=$CAS \
    timeout 1200 python -u tools/compare_convergence.py ours \
    /tmp/mslr_data 10000 NaiveAlgorithm > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
done
for s in 1 2; do
  tag=mslr_Naive_cascade_ref_s$s
  [ -f "$OUT/$tag.done" ] && continue
  ULTRA_CONV_EVALS=10 ULTRA_CONV_SEED=$s ULTRA_CONV_CLICK_JSON=$CAS \
    timeout 7200 python tools/compare_convergence.py ref \
    /tmp/mslr_data 10000 NaiveAlgorithm > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
done

# Naive + UBM 3v3 (the cleanest UBM head-to-head: persistent optimizer
# on both sides, free of the DLA per-step-reset artifact)
for s in 0 1 2; do
  tag=mslr_Naive_ubm_ours_s$s
  [ -f "$OUT/$tag.done" ] && continue
  ULTRA_CONV_EVALS=10 ULTRA_CONV_SEED=$s ULTRA_CONV_CLICK_JSON=$UBM \
    timeout 1200 python -u tools/compare_convergence.py ours \
    /tmp/mslr_data 10000 NaiveAlgorithm > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
done
for s in 0 1 2; do
  tag=mslr_Naive_ubm_ref_s$s
  [ -f "$OUT/$tag.done" ] && continue
  ULTRA_CONV_EVALS=10 ULTRA_CONV_SEED=$s ULTRA_CONV_CLICK_JSON=$UBM \
    timeout 7200 python tools/compare_convergence.py ref \
    /tmp/mslr_data 10000 NaiveAlgorithm > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
done

# the step-equivalence replay (CPU, ~40 min)
if [ ! -f "$OUT/replay_dla_ubm.done" ]; then
  ULTRA_PLATFORM=cpu timeout 5400 python -u tools/replay_dla.py \
    /tmp/mslr_data 2000 250 > "$OUT/replay_dla_ubm.log" 2>&1
  touch "$OUT/replay_dla_ubm.done"
fi
echo "r5 extra seeds complete"
