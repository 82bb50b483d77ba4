"""Serving-path throughput: bucketed Scorer, XLA vs fused Pallas kernel.

The training benchmark (bench.py) fuses feed + update into one scanned
program, where the Pallas kernels lose to XLA fusion (BASELINE.md table).
Serving is the opposite regime — a standalone forward (score + mask +
rank) per request — which is exactly where the fused MLP kernel measured
2.0x over XLA on the v5e chip. This tool measures the ACTUAL serving path
(``serve.Scorer._score_ranked``, including host->device transfer and
ranked-indices readback) at request-sized batches.

Run on TPU (one process at a time). Usage:
  python -u tools/bench_serve.py [--iters 200] [--features 136]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/ultra_tpu_jax"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--features", type=int, default=136)
    p.add_argument("--hidden", default="[512, 256, 128]")
    args = p.parse_args(argv)

    if os.environ.get("ULTRA_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["ULTRA_PLATFORM"])
    import jax

    from ultra_pytorch_tpu.models.dnn import DNN
    from ultra_pytorch_tpu.serve.scorer import Scorer

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    results = {}
    for name, hp_extra in (("xla", ""), ("pallas", ",use_pallas=true")):
        ranker = DNN(f"hidden_layer_sizes={args.hidden}" + hp_extra,
                     args.features)
        params = ranker.init(jax.random.PRNGKey(0), args.features)
        scorer = Scorer(ranker, params, args.features)
        for batch, list_size in ((8, 16), (256, 16), (256, 128)):
            feats = rng.normal(size=(batch, list_size, args.features)
                               ).astype(np.float32)
            scorer.score(feats)  # compile + warm
            t0 = time.perf_counter()
            for _ in range(args.iters):
                scorer._score_ranked(feats, None)
            dt = (time.perf_counter() - t0) / args.iters
            qps = batch / dt
            results[f"{name}_{batch}x{list_size}"] = round(qps, 1)
            print(f"{name:6s} batch {batch:4d} x list {list_size:4d}: "
                  f"{dt * 1e6:9.1f} us/request  {qps:12.1f} queries/s",
                  flush=True)
    print(json.dumps({"metric": "serve_throughput", "unit": "queries/s",
                      "results": results}))


if __name__ == "__main__":
    main()
