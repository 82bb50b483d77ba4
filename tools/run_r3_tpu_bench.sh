#!/bin/bash
# Round-3 TPU measurement pass: waits for the ours-side convergence queues
# to release the chip, then runs roofline/MFU accounting, eval-path
# throughput, the HTTP serving benchmark, and the headline bench.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/bench_r3
mkdir -p "$OUT"

until grep -q "queue2 complete" /tmp/conv_r3_ours/queue.log 2>/dev/null; do
  sleep 60
done

echo "=== tpu bench start $(date +%T)" >> "$OUT/bench.log"
run() {  # run <tag> <timeout> <cmd...>
  local tag=$1 to=$2; shift 2
  if [ -f "$OUT/$tag.done" ]; then return; fi
  echo "=== $tag $(date +%T)" >> "$OUT/bench.log"
  timeout "$to" "$@" > "$OUT/$tag.json" 2> "$OUT/$tag.err"
  echo "rc=$? $(date +%T)" >> "$OUT/bench.log"
  touch "$OUT/$tag.done"
}

run roofline_bench 2400 python -u tools/roofline.py
run roofline_yahoo 2400 python -u tools/roofline.py --features 700 --list-size 30
run bench_eval_mslr 2400 python -u tools/bench_eval.py --queries 1000 --list-size 200 --features 136
run bench_serve_http 2400 python -u tools/bench_serve_http.py
run bench_headline 1200 python -u bench.py
echo "tpu bench complete $(date +%T)" >> "$OUT/bench.log"
