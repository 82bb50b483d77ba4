#!/bin/bash
# Round-5 reference-side (torch CPU) run queue. Provenance for the r5
# BASELINE additions:
#   * reference IPWrank seeds 3-5 at MSLR shape (extends r4's 0-2 to a
#     6v6-seed study, VERDICT-r4 #1) — same /tmp/mslr_data files as r4
#     (regenerate with: python tools/make_toy_data.py /tmp/mslr_data \
#        --queries 10000 --valid_queries 1000 --features 136 \
#        --max_label 4 --min_docs 40 --max_docs 200);
#   * DLA with UBM clicks at MSLR shape (first non-PBM at-scale
#     head-to-head, VERDICT-r4 #4) — both sides read the REFERENCE's
#     bundled ubm_0.1_1_4_1.0.json so the exam tables are bit-identical;
#   * the 11-algorithm toy convergence table re-measure (VERDICT-r4 #3)
#     on /tmp/conv_data (python tools/make_toy_data.py /tmp/conv_data \
#        --queries 400), 600 steps, validations every 50.
set -u
cd "$(dirname "$0")/.."
export OMP_NUM_THREADS=1
OUT=/tmp/conv_r5
mkdir -p "$OUT"

for s in 3 4 5; do
  tag=mslr_IPW_ref_s$s
  [ -f "$OUT/$tag.done" ] && continue
  ULTRA_CONV_EVALS=20 ULTRA_CONV_SEED=$s timeout 14400 \
    python tools/compare_convergence.py ref /tmp/mslr_data 10000 IPWrank \
    > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
done

tag=mslr_DLA_ubm_ref
if [ ! -f "$OUT/$tag.done" ]; then
  ULTRA_CONV_EVALS=20 ULTRA_CONV_SEED=0 \
  ULTRA_CONV_CLICK_JSON=/root/reference/example/ClickModel/ubm_0.1_1_4_1.0.json \
    timeout 14400 \
    python tools/compare_convergence.py ref /tmp/mslr_data 10000 DLA \
    > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
fi

for a in DLA IPWrank RegressionEM PairDebias PDGD DBGD MGD NSGD \
         NaiveAlgorithm LambdaRank PRSrank; do
  tag=toy_${a}_ref
  [ -f "$OUT/$tag.done" ] && continue
  ULTRA_CONV_EVALS=12 ULTRA_CONV_SEED=0 timeout 7200 \
    python tools/compare_convergence.py ref /tmp/conv_data 600 $a \
    > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
done

# Bonus (VERDICT-r4 #4): cascade-click smoke at scale, reference side.
tag=mslr_Naive_cascade_ref
if [ ! -f "$OUT/$tag.done" ]; then
  ULTRA_CONV_EVALS=10 ULTRA_CONV_SEED=0 \
  ULTRA_CONV_CLICK_JSON=/root/reference/example/ClickModel/cascade_0.1_1.0_4_1.0.json \
    timeout 14400 \
    python tools/compare_convergence.py ref /tmp/mslr_data 10000 \
    NaiveAlgorithm > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
fi
echo "ref queue complete"
