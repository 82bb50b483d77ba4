"""Break the fused DLA train step into feed / train / full timings.

Measures three scan-fused programs on the bench protocol (batch 256 x
list 10 x 136 features, PBM clicks, DLA/DNN):

  feed  — query sampling + click simulation + feature gather only
  train — algorithm update only, on a fixed pre-built batch
  full  — the real fused pipeline (bench.py's program)

feed + train > full is expected: the full program overlaps and fuses
across the boundary. Use the deltas to see where step time goes before
hand-optimizing anything.

Usage: python -u tools/profile_step.py [--steps 200] [--prng rbg]
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

BATCH = 256
LIST_SIZE = 10
FEATURES = 136
CHUNK = 25


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--prng", default="rbg",
                    choices=["threefry2x32", "rbg", "unsafe_rbg"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", args.prng)

    from tools.bench_common import make_bench_setup

    alg, feed, dev = make_bench_setup(
        batch=BATCH, list_size=LIST_SIZE, features=FEATURES)
    state = alg.init_state(jax.random.PRNGKey(0), FEATURES)

    @partial(jax.jit, donate_argnums=(1,))
    def feed_chunk(state, rng, data):
        def body(rng, _):
            rng, k = jax.random.split(rng)
            batch = feed.train_batch(k, state, data)
            # touch every output so nothing is dead-code-eliminated
            s = sum(jnp.sum(v) for v in batch.values())
            return rng, s
        rng, sums = jax.lax.scan(body, rng, None, length=CHUNK)
        return rng, sums[-1]

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_chunk(state, rng, batch):
        def body(carry, _):
            state, rng = carry
            rng, k = jax.random.split(rng)
            state, metrics = alg.train_step(state, batch, k)
            return (state, rng), metrics["loss"]
        (state, rng), losses = jax.lax.scan(
            body, (state, rng), None, length=CHUNK)
        return state, rng, losses[-1]

    @partial(jax.jit, donate_argnums=(0, 1))
    def full_chunk(state, rng, data):
        def body(carry, _):
            state, rng = carry
            rng, kb, kt = jax.random.split(rng, 3)
            batch = feed.train_batch(kb, state, data)
            state, metrics = alg.train_step(state, batch, kt)
            return (state, rng), metrics["loss"]
        (state, rng), losses = jax.lax.scan(
            body, (state, rng), None, length=CHUNK)
        return state, rng, losses[-1]

    n_chunks = args.steps // CHUNK

    # feed only
    rng = jax.random.PRNGKey(1)
    rng, s = feed_chunk(state, rng, dev)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        rng, s = feed_chunk(state, rng, dev)
    jax.block_until_ready(s)
    us_feed = (time.perf_counter() - t0) / args.steps * 1e6
    print(f"  feed  {us_feed:8.1f} us/step", flush=True)

    # train only (fixed batch)
    batch = jax.jit(
        lambda k, d: feed.train_batch(k, state, d))(
            jax.random.PRNGKey(5), dev)
    st, rng2 = state, jax.random.PRNGKey(2)
    st, rng2, loss = train_chunk(st, rng2, batch)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        st, rng2, loss = train_chunk(st, rng2, batch)
    jax.block_until_ready(loss)
    us_train = (time.perf_counter() - t0) / args.steps * 1e6
    print(f"  train {us_train:8.1f} us/step", flush=True)

    # full pipeline
    st = alg.init_state(jax.random.PRNGKey(3), FEATURES)
    rng3 = jax.random.PRNGKey(4)
    st, rng3, loss = full_chunk(st, rng3, dev)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        st, rng3, loss = full_chunk(st, rng3, dev)
    jax.block_until_ready(loss)
    us_full = (time.perf_counter() - t0) / args.steps * 1e6
    print(f"  full  {us_full:8.1f} us/step", flush=True)

    print(json.dumps({"feed_us": round(us_feed, 1),
                      "train_us": round(us_train, 1),
                      "full_us": round(us_full, 1),
                      "prng": args.prng}))


if __name__ == "__main__":
    main()
