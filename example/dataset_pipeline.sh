#!/usr/bin/env bash
# Generic LETOR dataset preparation pipeline (parameterized equivalent of
# the reference's per-dataset example/<dataset>/offline_exp_pipeline.sh
# scripts): clean -> normalize -> sample -> initial ranking -> ULTRA prep
# -> train. Per-dataset wrappers in example/<dataset>/ set the variables.
#
#   DATA_PATH   directory containing {train,valid|vali,test}.txt (libsvm)
#   WORK        scratch/output directory
#   FEATURES    feature count (e.g. 136 for MSLR, 700 for Yahoo set1)
#   NORM_MODE   "" for linear [-1,1] rescale, "log" for log10 (Istella)
#   PREFIX      filename prefix (e.g. "set1." for Yahoo)
#   SETTING     experiment JSON (default configs/dla.json)
set -euo pipefail
cd "$(dirname "$0")/.."

DATA_PATH=${DATA_PATH:?set DATA_PATH to the raw libsvm directory}
WORK=${WORK:?set WORK to a scratch directory}
FEATURES=${FEATURES:?set FEATURES}
NORM_MODE=${NORM_MODE:-}
PREFIX=${PREFIX:-}
SETTING=${SETTING:-configs/dla.json}
MAX_ITER=${MAX_ITER:-10000}
BATCH=${BATCH:-256}

mkdir -p "$WORK"/{cleaned,normalized,rank,prep}

# Accept vali.txt or valid.txt; split train 10% when neither exists
# (ref MSLR pipeline's fallback).
VALID_SRC="$DATA_PATH/${PREFIX}vali.txt"
[ -f "$VALID_SRC" ] || VALID_SRC="$DATA_PATH/${PREFIX}valid.txt"
if [ ! -f "$VALID_SRC" ]; then
  echo "no valid split; carving 10% of train"
  python libsvm_tools/split_libsvm_data.py \
    "$DATA_PATH/${PREFIX}train.txt" "$WORK/cleaned/valid_raw.txt" \
    "$WORK/cleaned/train_raw.txt" 0.1 13
  TRAIN_SRC="$WORK/cleaned/train_raw.txt"
  VALID_SRC="$WORK/cleaned/valid_raw.txt"
else
  TRAIN_SRC="$DATA_PATH/${PREFIX}train.txt"
fi

echo "cleaning"
python libsvm_tools/clean_libsvm_file.py "$TRAIN_SRC" "$WORK/cleaned/train.txt" 0
python libsvm_tools/clean_libsvm_file.py "$VALID_SRC" "$WORK/cleaned/valid.txt" 1
python libsvm_tools/clean_libsvm_file.py "$DATA_PATH/${PREFIX}test.txt" "$WORK/cleaned/test.txt" 1

echo "normalizing ($NORM_MODE)"
python libsvm_tools/extract_feature_statistics.py "$WORK/cleaned/"
for split in train valid test; do
  python libsvm_tools/normalize_feature.py \
    "$WORK/cleaned/feature_scale.json" "$WORK/cleaned/$split.txt" \
    "$WORK/normalized/$split.txt" $NORM_MODE
done

echo "initial ranking (1% sample, linear ranker)"
python libsvm_tools/sample_libsvm_data.py \
  "$WORK/normalized/train.txt" "$WORK/normalized/sampled_train.txt" 0.01 13
python libsvm_tools/initial_ranking_with_linear.py \
  "$WORK/normalized/sampled_train.txt" "$WORK/normalized/valid.txt" \
  "$WORK/normalized/test.txt" "$WORK/rank/" 500
# overwrite train predictions with the full train file
python - "$WORK" <<'PYEOF'
import sys, numpy as np, os
work = sys.argv[1]
sys.path.insert(0, "libsvm_tools")
from initial_ranking_with_linear import _read_libsvm, _dense
m = np.load(os.path.join(work, "rank", "model.npz"))
_, _, rows, _ = _read_libsvm(os.path.join(work, "normalized", "train.txt"))
scores = _dense(rows, m["w"].shape[0]) @ m["w"] + float(m["b"])
with open(os.path.join(work, "rank", "train.predict"), "w") as f:
    for s in scores:
        f.write(f"{float(s):.8f}\n")
PYEOF

echo "preparing ULTRA format"
python libsvm_tools/prepare_exp_data_with_rank.py \
  "$WORK/normalized" "$WORK/rank/" "$WORK/prep/" "$FEATURES"

echo "training"
python main.py \
  --data_dir="$WORK/prep/" --model_dir="$WORK/model/" \
  --output_dir="$WORK/out/" --setting_file="$SETTING" \
  --batch_size="$BATCH" --max_train_iteration="$MAX_ITER"

python main.py \
  --data_dir="$WORK/prep/" --model_dir="$WORK/model/" \
  --output_dir="$WORK/out/" --setting_file="$SETTING" --test_only
