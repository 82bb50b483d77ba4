#!/usr/bin/env bash
# MSLR-WEB10K (https://www.microsoft.com/en-us/research/project/mslr/):
# unzip MSLR-WEB10K.zip, point DATA_PATH at a fold (e.g. Fold1).
DATA_PATH=${DATA_PATH:-./MSLR_10k_letor/Fold1} \
WORK=${WORK:-./MSLR_10k_letor/work} \
FEATURES=136 NORM_MODE="" \
exec bash "$(dirname "$0")/../dataset_pipeline.sh"
