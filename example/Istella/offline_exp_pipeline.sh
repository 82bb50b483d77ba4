#!/usr/bin/env bash
# Istella LETOR (http://quickrank.isti.cnr.it/istella-dataset/): heavy-
# tailed features, log10 normalization (ref normalize_feature.py:9-26).
DATA_PATH=${DATA_PATH:-./istella/full} \
WORK=${WORK:-./istella/work} \
FEATURES=220 NORM_MODE=log \
exec bash "$(dirname "$0")/../dataset_pipeline.sh"
