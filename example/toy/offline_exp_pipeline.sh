#!/usr/bin/env bash
# Toy offline experiment pipeline (capability parity with ref
# example/toy/offline_exp_pipeline.sh + the MSLR pipelines): clean ->
# feature stats -> normalize -> initial ranking (framework Linear ranker
# instead of the SVMrank binary) -> ULTRA-format prep -> train.
set -euo pipefail
cd "$(dirname "$0")/../.."

RAW=tests/data            # toy libsvm twin lives next to the ULTRA fixtures
WORK=${WORK:-/tmp/ultra_toy_pipeline}
mkdir -p "$WORK"/{raw,rank,prep}

for split in train valid test; do
  python libsvm_tools/clean_libsvm_file.py \
    "$RAW/$split/$split.txt" "$WORK/raw/$split.txt" 1
done

python libsvm_tools/extract_feature_statistics.py "$WORK/raw/"
for split in train valid test; do
  python libsvm_tools/normalize_feature.py \
    "$WORK/raw/feature_scale.json" "$WORK/raw/$split.txt" \
    "$WORK/raw/$split.norm.txt"
  mv "$WORK/raw/$split.norm.txt" "$WORK/raw/$split.txt"
done

ULTRA_PLATFORM=${ULTRA_PLATFORM:-} python libsvm_tools/initial_ranking_with_linear.py \
  "$WORK/raw/train.txt" "$WORK/raw/valid.txt" "$WORK/raw/test.txt" \
  "$WORK/rank/" 200

FEATURE_SIZE=$(python -c "import json;print(len(json.load(open('$WORK/raw/feature_scale.json'))))")
python libsvm_tools/prepare_exp_data_with_rank.py \
  "$WORK/raw" "$WORK/rank/" "$WORK/prep/" "$FEATURE_SIZE"

python main.py \
  --data_dir="$WORK/prep/" \
  --model_dir="$WORK/model/" \
  --output_dir="$WORK/out/" \
  --setting_file=configs/dla.json \
  --batch_size=16 \
  --max_train_iteration="${MAX_ITER:-100}" \
  --steps_per_checkpoint=50

python main.py \
  --data_dir="$WORK/prep/" \
  --model_dir="$WORK/model/" \
  --output_dir="$WORK/out/" \
  --setting_file=configs/dla.json \
  --test_only
