#!/usr/bin/env bash
DATA_PATH=${DATA_PATH:-./MSLR_30k_letor/Fold1} \
WORK=${WORK:-./MSLR_30k_letor/work} \
FEATURES=136 NORM_MODE="" \
exec bash "$(dirname "$0")/../dataset_pipeline.sh"
