"""Istella-scale feature-table sharding demo (VERDICT-r3 #7 done-criterion).

Synthesizes a full-Istella-SIZED dataset (10M query-doc rows x 220
features = 8.8 GB of f32 — the real Istella is ~10.4M rows x 220), shards
it over the 8-device virtual CPU mesh with
``parallel.device_sharded_dataset``, and trains DLA steps through the
standard ``make_dp_train_step`` path.

Replicating this table would put 8.8 GB + a donation copy on EVERY
device — over a real v5e's 16 GB HBM budget once activations and the
optimizer state join it. Sharded, each device holds ~1/8th.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/shard_data_demo.py [--rows 10000000] [--features 220]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=10_000_000)
    p.add_argument("--features", type=int, default=220)
    p.add_argument("--list_size", type=int, default=200)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ultra_pytorch_tpu.data.dataset import RankingDataset
    from ultra_pytorch_tpu.input_layer.feeds import ClickSimulationFeed
    from ultra_pytorch_tpu.parallel import (
        device_sharded_dataset, make_dp_train_step, make_mesh)
    from ultra_pytorch_tpu.run.experiment import create_algorithm

    L = args.list_size
    Q = args.rows // L
    F = args.features
    rng = np.random.default_rng(0)
    print(f"synthesizing {Q} queries x {L} docs x {F} features "
          f"({Q * L * F * 4 / 1e9:.1f} GB table)...", flush=True)
    t0 = time.time()
    # Block-generate to keep peak RAM at one table's worth.
    features = np.empty((Q * L, F), np.float32)
    for s in range(0, Q * L, 1_000_000):
        e = min(s + 1_000_000, Q * L)
        features[s:e] = rng.standard_normal((e - s, F), dtype=np.float32)
    initial_list = np.arange(Q * L, dtype=np.int64).reshape(Q, L)
    labels = rng.integers(0, 5, size=(Q, L)).astype(np.float32)
    labels[:, 0] = np.maximum(labels[:, 0], 1.0)
    ds = RankingDataset(
        features=features, initial_list=initial_list, labels=labels,
        qids=np.arange(Q), dids=np.arange(Q * L),
        feature_size=F, rank_list_size=L, max_label=4.0)
    print(f"  built in {time.time() - t0:.1f}s", flush=True)

    mesh = make_mesh(8)
    t0 = time.time()
    dev = device_sharded_dataset(ds, mesh, list_size=L)
    shard_gb = dev.features.addressable_shards[0].data.nbytes / 1e9
    total_gb = ds.features.nbytes / 1e9
    print(f"sharded in {time.time() - t0:.1f}s: {shard_gb:.2f} GB/device "
          f"vs {total_gb:.2f} GB replicated "
          f"({total_gb / shard_gb:.1f}x reduction)", flush=True)
    del ds, features, initial_list, labels

    settings = {
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[512, 256, 128]",
        "learning_algorithm": "DLA",
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg"],
        "metrics_topn": [10],
        "max_candidate_num": L,
        "selection_bias_cutoff": 10,
    }
    alg = create_algorithm(settings, F, 4.0)
    cm_path = os.path.join(REPO, "example", "ClickModel",
                           "pbm_0.1_1.0_4_1.0.json")
    feed = ClickSimulationFeed(alg, args.batch,
                               f"click_model_json={cm_path}", dev,
                               list_size=L)
    step_fn = make_dp_train_step(alg, feed, mesh, host_sharded_data=True)
    state = alg.init_state(jax.random.PRNGKey(0), F)
    k = jax.random.PRNGKey(1)
    t0 = time.time()
    losses = []
    for i in range(args.steps):
        k, sub = jax.random.split(k)
        state, metrics = step_fn(state, sub, dev)
        losses.append(float(metrics["loss"]))
    dt = time.time() - t0
    print(json.dumps({
        "rows": Q * L, "features": F,
        "gb_per_device_sharded": round(shard_gb, 2),
        "gb_replicated": round(total_gb, 2),
        "steps": args.steps, "loss_first": round(losses[0], 4),
        "loss_last": round(losses[-1], 4),
        "queries_per_s_cpu_mesh": round(args.steps * args.batch / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
