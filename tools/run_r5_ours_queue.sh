#!/bin/bash
# Round-5 ours-side (TPU) run queue — counterpart of run_r5_ref_queue.sh.
# Only ONE process may hold the TPU on this host: this queue is the sole
# TPU user while it runs; pause it before any perf benching.
#   * the 11-algorithm toy convergence table re-measure under the
#     torch-exact Adagrad (VERDICT-r4 #3), /tmp/conv_data, 600 steps;
#   * DLA with UBM clicks at MSLR shape, 10k iters (VERDICT-r4 #4);
#   * cascade-click smoke at scale (bonus).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/conv_r5
mkdir -p "$OUT"

for a in DLA IPWrank RegressionEM PairDebias PDGD DBGD MGD NSGD \
         NaiveAlgorithm LambdaRank PRSrank; do
  tag=toy_${a}_ours
  [ -f "$OUT/$tag.done" ] && continue
  ULTRA_CONV_EVALS=12 ULTRA_CONV_SEED=0 timeout 7200 \
    python -u tools/compare_convergence.py ours /tmp/conv_data 600 $a \
    > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
done

tag=mslr_DLA_ubm_ours
if [ ! -f "$OUT/$tag.done" ]; then
  ULTRA_CONV_EVALS=20 ULTRA_CONV_SEED=0 \
  ULTRA_CONV_CLICK_JSON=/root/reference/example/ClickModel/ubm_0.1_1_4_1.0.json \
    timeout 7200 \
    python -u tools/compare_convergence.py ours /tmp/mslr_data 10000 DLA \
    > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
fi

tag=mslr_Naive_cascade_ours
if [ ! -f "$OUT/$tag.done" ]; then
  ULTRA_CONV_EVALS=10 ULTRA_CONV_SEED=0 \
  ULTRA_CONV_CLICK_JSON=/root/reference/example/ClickModel/cascade_0.1_1.0_4_1.0.json \
    timeout 7200 \
    python -u tools/compare_convergence.py ours /tmp/mslr_data 10000 \
    NaiveAlgorithm > "$OUT/$tag.log" 2>&1
  touch "$OUT/$tag.done"
fi
echo "ours queue complete"
