"""Validation-path throughput (VERDICT r2 #5).

Measures `Experiment.validate` wall time at a given dataset shape — the
scan-fused path vs the naive per-batch python loop it replaced — and
reports queries/s plus the share of a steps_per_checkpoint=50 training
window validation would consume at the headline train throughput.

Usage (TPU):
  python tools/bench_eval.py [--queries 1000] [--list-size 200]
      [--features 136] [--batch 256] [--repeats 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/ultra_tpu_jax"))

if os.environ.get("ULTRA_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["ULTRA_PLATFORM"])


def naive_validate(exp, split="valid"):
    """The pre-r3 implementation: python loop, one eval_fn call per batch,
    blocking float() per metric per batch."""
    import jax

    from ultra_pytorch_tpu.data.dataset import merge_summary

    alg = exp.algorithm
    eval_fn = jax.jit(
        lambda state, batch, rng: alg.validation_metrics(state, batch,
                                                         rng=rng))
    summaries, counts = [], []
    for batch, _, count in exp.feeds[split].eval_batches():
        _, summary = eval_fn(exp.state, batch, None)
        summaries.append({k: float(v) for k, v in summary.items()})
        counts.append(count)
    return merge_summary(summaries, counts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--queries", type=int, default=1000)
    p.add_argument("--list-size", type=int, default=200)
    p.add_argument("--features", type=int, default=136)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--train-qps", type=float, default=1_850_000,
                   help="headline train throughput for the window-share calc "
                        "(default: the r4 driver-captured BENCH_r04 number)")
    args = p.parse_args()

    import tempfile

    import numpy as np

    from tools.make_toy_data import main as make_main
    from ultra_pytorch_tpu.run.experiment import Experiment

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    td = tempfile.mkdtemp(prefix="bench_eval_")
    make_main([td, "--queries", "64", "--valid_queries", str(args.queries),
               "--features", str(args.features),
               "--min_docs", str(max(args.list_size // 2, 3)),
               "--max_docs", str(args.list_size)])
    settings = {
        "train_input_feed": "ClickSimulationFeed",
        "train_input_hparams": f"click_model_json={repo}/example/"
                               "ClickModel/pbm_0.1_1.0_4_1.0.json",
        "valid_input_feed": "DirectLabelFeed",
        "valid_input_hparams": "",
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[512,256,128]",
        "learning_algorithm": "DLA",
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg", "mrr"],
        "metrics_topn": [3, 5, 10],
        "objective_metric": "ndcg_10",
        "selection_bias_cutoff": 10,
    }
    exp = Experiment(settings, td, os.path.join(td, "model"),
                     batch_size=args.batch, seed=0, dp=0)
    exp.setup(splits=("train", "valid"))
    exp.init_state()

    import jax

    out = {"queries": args.queries, "list_size": args.list_size,
           "features": args.features, "batch": args.batch,
           "metric_values": 6}
    for name, fn in [("fused", exp.validate),
                     ("naive_loop", lambda: naive_validate(exp))]:
        s1 = fn()   # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            s2 = fn()
        dt = (time.perf_counter() - t0) / args.repeats
        for k in s1:
            assert abs(s1[k] - s2[k]) < 1e-4, (k, s1[k], s2[k])
        out[name] = {
            "wall_s": round(dt, 4),
            "eval_queries_per_sec": round(args.queries / dt, 1),
            # share of a 50-step train window this validation pass costs
            "window_share_pct": round(100 * dt / (
                dt + 50 * args.batch / args.train_qps), 1),
        }

    # Pipelined steady state (the r5 driver's regime): dispatch pass i+1
    # BEFORE fetching pass i's single summary vector, so the tunnel
    # round trip of each fetch overlaps with the next pass's device
    # compute. This is the per-pass cost validation actually adds to a
    # training run under main.py's pipelined window loop.
    _, prev = exp.validate_device()          # warm (already compiled)
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        _, cur = exp.validate_device()
        jax.device_get(prev)
        prev = cur
    jax.device_get(prev)
    dt = (time.perf_counter() - t0) / (args.repeats + 1)
    out["pipelined"] = {
        "wall_s": round(dt, 4),
        "eval_queries_per_sec": round(args.queries / dt, 1),
        "window_share_pct": round(100 * dt / (
            dt + 50 * args.batch / args.train_qps), 1),
    }
    # Deep pipeline: dispatch ALL passes, then fetch all — transfers
    # overlap each other and the remaining device work, so per-pass cost
    # approaches pure device time. This is the regime the driver's
    # window loop actually runs in (the eval fetch rides along with the
    # next train window's 50+ ms of device compute).
    n = args.repeats + 1
    t0 = time.perf_counter()
    vecs = [exp.validate_device()[1] for _ in range(n)]
    jax.device_get(vecs)
    dt = (time.perf_counter() - t0) / n
    out["deep_pipeline"] = {
        "wall_s": round(dt, 4),
        "eval_queries_per_sec": round(args.queries / dt, 1),
        "window_share_pct": round(100 * dt / (
            dt + 50 * args.batch / args.train_qps), 1),
    }
    out["speedup"] = round(out["naive_loop"]["wall_s"]
                           / out["fused"]["wall_s"], 2)
    out["speedup_pipelined"] = round(out["naive_loop"]["wall_s"]
                                     / out["pipelined"]["wall_s"], 2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
