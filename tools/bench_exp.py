"""Bench variants: probe scan window / PRNG impl / shapes on the DLA step.

Same protocol family as bench.py; knobs via argv. Used to pick bench.py
defaults and to measure production-scale shapes (numbers in BASELINE.md).

  python tools/bench_exp.py --chunk 100 --prng rbg --steps 400
  python tools/bench_exp.py --features 700 --list-size 30   # Yahoo-like
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

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

    from __graft_entry__ import _exp_settings, _make_synthetic
    from ultra_pytorch_tpu.input_layer.feeds import ClickSimulationFeed
    from ultra_pytorch_tpu.run.experiment import create_algorithm
    from ultra_pytorch_tpu.sim.click_models import click_model_json_numpy

    import tempfile

    BATCH, LIST_SIZE, FEATURES = args.batch, args.list_size, args.features
    ds = _make_synthetic(num_queries=4096, list_size=LIST_SIZE,
                         feature_size=FEATURES)
    settings = _exp_settings(LIST_SIZE)
    settings["ranking_model_hparams"] += args.ranker_extra
    alg = create_algorithm(settings, ds.feature_size, ds.max_label)
    dev = ds.to_device()

    with tempfile.TemporaryDirectory() as td:
        cm_path = os.path.join(td, "pbm.json")
        with open(cm_path, "w") as fout:
            json.dump(click_model_json_numpy("pbm", 0.1, 1.0, 4, 1.0), fout)
        feed = ClickSimulationFeed(alg, BATCH,
                                   f"click_model_json={cm_path}", dev)

        CHUNK = args.chunk

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

        t0 = time.perf_counter()
        state, rng, loss = run_chunk(state, rng, dev)
        jax.block_until_ready(loss)
        print(f"(compile+warmup {time.perf_counter() - t0:.1f}s, "
              f"loss={float(loss):.4f})", flush=True)

        t0 = time.perf_counter()
        for _ in range(args.steps // CHUNK):
            state, rng, loss = run_chunk(state, rng, dev)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0

    qps = (args.steps // CHUNK) * CHUNK * BATCH / dt
    print(json.dumps({"chunk": CHUNK, "prng": args.prng, "batch": BATCH,
                      "features": FEATURES, "list_size": LIST_SIZE,
                      "ranker_extra": args.ranker_extra,
                      "queries_per_s": round(qps, 1)}))


if __name__ == "__main__":
    main()
