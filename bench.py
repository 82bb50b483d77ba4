"""Benchmark: DLA training throughput (queries/sec) on one chip.

Protocol mirrors the reference's reproducible configuration
(ref ``main.py:42-56`` + ``example/offline_setting/dla_exp_settings.json``):
batch 256, selection_bias_cutoff 10, DNN [512, 256, 128], 136 features,
PBM eta=1.0 click simulation — the full fused pipeline (query sampling,
on-device feature gather, click simulation, dual-tower DLA update) per step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "queries/s", "vs_baseline": N}

``vs_baseline`` compares against the reference PyTorch implementation's
measured throughput on this machine's CPU (see BASELINE.md; the reference
has no accelerator path on TPU hosts and no published numbers).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/ultra_tpu_jax"))

# Reference throughput (queries/s) of ULTRA_pytorch DLA/DNN/batch-256 on this
# host's CPU, measured via tools/bench_reference.py -> BASELINE.md.
REFERENCE_QPS = float(os.environ.get("ULTRA_REF_QPS", "2142"))

BATCH = 256
LIST_SIZE = 10
FEATURES = 136
NUM_QUERIES = 4096
BENCH_STEPS = 400
# Warmup is ONE compiled chunk (CHUNK=25 steps): the first run_chunk call
# below compiles and executes before timing starts.


def main():
    import jax

    # TPU hardware PRNG (XLA RngBitGenerator) instead of threefry: the
    # counter-based threefry keygen/uniforms cost ~80us of the ~310us step
    # at these shapes; rbg is +25% end-to-end (tools/bench_exp.py,
    # BASELINE.md). Statistically sound; streams are not bit-stable across
    # compiler versions, which a throughput benchmark doesn't need.
    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _exp_settings, _make_synthetic
    from ultra_pytorch_tpu.input_layer.feeds import ClickSimulationFeed
    from ultra_pytorch_tpu.run.experiment import create_algorithm
    from ultra_pytorch_tpu.sim.click_models import click_model_json_numpy

    import tempfile

    ds = _make_synthetic(num_queries=NUM_QUERIES, list_size=LIST_SIZE,
                         feature_size=FEATURES)
    settings = _exp_settings(LIST_SIZE)
    alg = create_algorithm(settings, ds.feature_size, ds.max_label)
    dev = ds.to_device()

    with tempfile.TemporaryDirectory() as td:
        cm_path = os.path.join(td, "pbm.json")
        with open(cm_path, "w") as fout:
            json.dump(click_model_json_numpy("pbm", 0.1, 1.0, 4, 1.0), fout)
        feed = ClickSimulationFeed(alg, BATCH,
                                   f"click_model_json={cm_path}", dev)

        CHUNK = 50  # steps per dispatch (lax.scan window; tools/bench_exp.py
        #             measured 25/50/100 — 50 is the plateau)

        # Donating (state, rng) lets XLA update the TrainState in place —
        # no copy of params/optimizer buffers between dispatches. The
        # dataset rides as an ARGUMENT (pytree), not a closure constant.
        @partial(jax.jit, donate_argnums=(0, 1))
        def run_chunk(state, rng, data):
            def body(carry, _):
                state, rng = carry
                rng, k_batch, k_train = jax.random.split(rng, 3)
                batch = feed.train_batch(k_batch, state, data)
                state, metrics = alg.train_step(state, batch, k_train)
                return (state, rng), metrics["loss"]

            (state, rng), losses = jax.lax.scan(
                body, (state, rng), None, length=CHUNK)
            return state, rng, losses[-1]

        state = alg.init_state(jax.random.PRNGKey(0), ds.feature_size)
        rng = jax.random.PRNGKey(1)

        state, rng, loss = run_chunk(state, rng, dev)  # warmup + compile
        jax.block_until_ready(loss)

        t0 = time.perf_counter()
        for _ in range(BENCH_STEPS // CHUNK):
            state, rng, loss = run_chunk(state, rng, dev)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0

    qps = BENCH_STEPS * BATCH / dt
    print(json.dumps({
        "metric": "dla_dnn_train_throughput",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / REFERENCE_QPS, 2),
    }))


if __name__ == "__main__":
    main()
