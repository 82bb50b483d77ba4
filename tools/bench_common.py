"""Shared harness for the DLA benchmark protocol.

One definition of the protocol used by every published table (bench.py,
tools/bench_exp.py, tools/bench_pallas.py, tools/profile_step.py):
synthetic ULTRA-format data, ClickSimulationFeed with PBM eta=1.0, DLA/DNN
[512,256,128], scan-fused chunks with donated TrainState, and the
DeviceDataset passed as a jit ARGUMENT (never a closure constant).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from functools import partial


def make_bench_setup(batch=256, list_size=10, features=136,
                     num_queries=4096, ranker_extra="", algo_extra="",
                     feed_extra=""):
    """Build (algorithm, feed, device_dataset) on the bench protocol.

    Creates a throwaway click-model JSON in a temp dir that lives as long
    as the returned feed (handle attached to it).
    """
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _exp_settings, _make_synthetic
    from ultra_pytorch_tpu.input_layer.feeds import ClickSimulationFeed
    from ultra_pytorch_tpu.run.experiment import create_algorithm
    from ultra_pytorch_tpu.sim.click_models import click_model_json_numpy

    ds = _make_synthetic(num_queries=num_queries, list_size=list_size,
                         feature_size=features)
    settings = _exp_settings(list_size)
    settings["ranking_model_hparams"] += ranker_extra
    settings["learning_algorithm_hparams"] = algo_extra
    alg = create_algorithm(settings, ds.feature_size, ds.max_label)
    dev = ds.to_device()

    td = tempfile.TemporaryDirectory()
    cm_path = os.path.join(td.name, "pbm.json")
    with open(cm_path, "w") as fout:
        json.dump(click_model_json_numpy("pbm", 0.1, 1.0, 4, 1.0), fout)
    feed = ClickSimulationFeed(
        alg, batch, f"click_model_json={cm_path}" + feed_extra, dev)
    feed._tmpdir = td  # keep the click-model JSON alive with the feed
    return alg, feed, dev


def make_run_chunk(alg, feed, chunk):
    """The donated scan-window step: run_chunk(state, rng, data). Uses the
    feed's hoisted window plan when available (feeds.py train_batch_plan)."""
    import jax
    import jax.numpy as jnp

    plan_capable = feed.can_plan()

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(state, rng, data):
        if plan_capable:
            rng, k_plan = jax.random.split(rng)
            plan = feed.train_batch_plan(k_plan, state, data, chunk)

            def body(carry, i):
                state, rng = carry
                rng, k_train = jax.random.split(rng)
                batch = feed.batch_from_plan(plan, i, data)
                state, metrics = alg.train_step(state, batch, k_train)
                return (state, rng), metrics["loss"]

            (state, rng), losses = jax.lax.scan(
                body, (state, rng), jnp.arange(chunk))
        else:
            def body(carry, _):
                state, rng = carry
                rng, k_batch, k_train = jax.random.split(rng, 3)
                batch = feed.train_batch(k_batch, state, data)
                state, metrics = alg.train_step(state, batch, k_train)
                return (state, rng), metrics["loss"]

            (state, rng), losses = jax.lax.scan(
                body, (state, rng), None, length=chunk)
        return state, rng, losses[-1]

    return run_chunk


def time_chunks(alg, feed, dev, steps, chunk, feature_size,
                verbose=True):
    """Compile+warm one chunk, then time `steps` steps; returns queries/s."""
    import jax

    run_chunk = make_run_chunk(alg, feed, chunk)
    state = alg.init_state(jax.random.PRNGKey(0), feature_size)
    rng = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    state, rng, loss = run_chunk(state, rng, dev)
    jax.block_until_ready(loss)
    if verbose:
        print(f"    (compile+warmup {time.perf_counter() - t0:.1f}s, "
              f"loss={float(loss):.4f})", flush=True)

    t0 = time.perf_counter()
    for _ in range(steps // chunk):
        state, rng, loss = run_chunk(state, rng, dev)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return (steps // chunk) * chunk * feed.batch_size / dt
