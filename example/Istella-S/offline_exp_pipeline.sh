#!/usr/bin/env bash
DATA_PATH=${DATA_PATH:-./istella-s/sample} \
WORK=${WORK:-./istella-s/work} \
FEATURES=220 NORM_MODE=log \
exec bash "$(dirname "$0")/../dataset_pipeline.sh"
