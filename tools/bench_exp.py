"""Bench variants: probe scan window / PRNG impl / shapes on the DLA step.

Same protocol as bench.py (shared harness in tools/bench_common.py);
knobs via argv. Used to pick bench.py defaults and to measure
production-scale shapes (numbers in BASELINE.md).

  python tools/bench_exp.py --chunk 100 --prng rbg --steps 400
  python tools/bench_exp.py --features 700 --list-size 30   # Yahoo-like
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/ultra_tpu_jax"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--prng", default="threefry2x32",
                    choices=["threefry2x32", "rbg", "unsafe_rbg"])
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--features", type=int, default=136)
    ap.add_argument("--list-size", type=int, default=10)
    ap.add_argument("--ranker-extra", default="",
                    help="appended to ranking_model_hparams, e.g. "
                         "',use_pallas=true' or ',compute_dtype=bfloat16'")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", args.prng)

    from tools.bench_common import make_bench_setup, time_chunks

    alg, feed, dev = make_bench_setup(
        batch=args.batch, list_size=args.list_size, features=args.features,
        ranker_extra=args.ranker_extra)
    qps = time_chunks(alg, feed, dev, args.steps, args.chunk, args.features)
    print(json.dumps({"chunk": args.chunk, "prng": args.prng,
                      "batch": args.batch, "features": args.features,
                      "list_size": args.list_size,
                      "ranker_extra": args.ranker_extra,
                      "queries_per_s": round(qps, 1)}))


if __name__ == "__main__":
    main()
