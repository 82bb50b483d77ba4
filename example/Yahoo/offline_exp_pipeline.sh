#!/usr/bin/env bash
# Yahoo! LTR Challenge set1 (https://webscope.sandbox.yahoo.com/):
# files are set1.train.txt etc.
DATA_PATH=${DATA_PATH:-./Yahoo_letor/ltrc_yahoo} \
WORK=${WORK:-./Yahoo_letor/work} \
FEATURES=700 NORM_MODE="" PREFIX="set1." \
exec bash "$(dirname "$0")/../dataset_pipeline.sh"
