#!/bin/bash
# Corrected-harness reference-side non-PBM reruns (BASELINE.md r5 non-PBM
# section). The first r5 reference runs were invalidated by the
# compare_convergence feed-hparam bug (fixed in the same commit that
# quarantined them); this queue re-executes every reference seed under the
# corrected harness, which prints the ACTIVE click model into each log.
# Regenerate the dataset first (deterministic, seed 1234):
#   python tools/make_toy_data.py /tmp/mslr_data --queries 10000 \
#     --valid_queries 1000 --features 136 --max_label 4 \
#     --min_docs 40 --max_docs 200
# All jobs are CPU torch; run lane A and lane B in parallel on a 2-core
# host:  bash tools/run_r5_ref_rerun.sh A &  bash tools/run_r5_ref_rerun.sh B
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/conv_r5
mkdir -p "$OUT"
UBM=/root/reference/example/ClickModel/ubm_0.1_1_4_1.0.json
CAS=/root/reference/example/ClickModel/cascade_0.1_1.0_4_1.0.json
export OMP_NUM_THREADS=1
LANE="${1:-A}"

run_ref() {  # tag algo click_json seed evals
  local tag=$1 algo=$2 cj=$3 s=$4 evals=$5
  [ -f "$OUT/$tag.done" ] && return
  ULTRA_CONV_EVALS=$evals ULTRA_CONV_SEED=$s ULTRA_CONV_CLICK_JSON=$cj \
    timeout 7200 python tools/compare_convergence.py ref \
    /tmp/mslr_data 10000 "$algo" > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
}

if [ "$LANE" = A ]; then
  # Naive+cascade 3 seeds, then DLA+UBM seeds 0-1
  for s in 0 1 2; do
    run_ref mslr_Naive_cascade_ref_s$s NaiveAlgorithm "$CAS" $s 10
  done
  for s in 0 1; do
    run_ref mslr_DLA_ubm_ref_s$s DLA "$UBM" $s 20
  done
  echo "lane A complete"
else
  # Naive+UBM 3 seeds, then DLA+UBM seed 2
  for s in 0 1 2; do
    run_ref mslr_Naive_ubm_ref_s$s NaiveAlgorithm "$UBM" $s 10
  done
  run_ref mslr_DLA_ubm_ref_s2 DLA "$UBM" 2 20
  echo "lane B complete"
fi
