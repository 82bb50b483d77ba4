"""Pallas kernel on/off evaluation on the real TPU chip.

Settles the "fused Pallas kernels" question with hardware data
(BASELINE.md table). Three parts, each printed incrementally:

1. correctness: every kernel (non-interpret) vs its jnp reference path;
2. microbenchmarks: kernel vs XLA-fused jnp equivalent, same shapes as the
   DLA bench protocol (batch 256 x list 10 x 136 features);
3. end-to-end: the bench.py DLA scan-window protocol with each kernel
   toggled on, reported as queries/s vs the all-off baseline.

Run on TPU only (one process at a time; compiles go through the remote
compile service, so the first run of each combo can take minutes — the
compilation cache makes reruns cheap).

Usage: python -u tools/bench_pallas.py [--steps 200] [--micro 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/ultra_tpu_jax"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
LIST_SIZE = 10
FEATURES = 136


def _timeit(fn, iters):
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def part1_correctness():
    import jax
    import jax.numpy as jnp

    from ultra_pytorch_tpu.models.dnn import DNN
    from ultra_pytorch_tpu.ops import losses
    from ultra_pytorch_tpu.ops.pallas.mlp import fused_mlp_score
    from ultra_pytorch_tpu.ops.pallas.listwise_loss import fused_softmax_loss
    from ultra_pytorch_tpu.ops.pallas.click_sim import pallas_sample_pbm_clicks
    from ultra_pytorch_tpu.sim import click_models as cm

    print("== part 1: correctness on", jax.default_backend(), flush=True)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)

    # fused MLP
    ranker = DNN("hidden_layer_sizes=[512, 256, 128]")
    params = ranker.init(k1, FEATURES)
    feats = jax.random.normal(k2, (BATCH, LIST_SIZE, FEATURES))
    # On TPU the XLA path's f32 matmuls run at the default (reduced) MXU
    # precision while the kernel requests full f32 accumulation, so compare
    # both against the highest-precision XLA result.
    with jax.default_matmul_precision("highest"):
        ref = jax.jit(lambda p, x: ranker.apply(p, x))(params, feats)
    xla_def = ranker.apply(params, feats)
    got = fused_mlp_score(params["layers"], feats, interpret=False)
    err = float(jnp.max(jnp.abs(ref - got)))
    err_xla = float(jnp.max(jnp.abs(ref - xla_def)))
    print(f"fused_mlp_score fwd max|err| vs highest-precision XLA: "
          f"pallas={err:.2e}, default-XLA={err_xla:.2e}", flush=True)
    assert err < max(2e-3, 2 * err_xla + 1e-4), (err, err_xla)

    def loss_ref(p):
        return jnp.mean(ranker.apply(p, feats) ** 2)

    def loss_pal(p):
        return jnp.mean(fused_mlp_score(p["layers"], feats,
                                        interpret=False) ** 2)

    with jax.default_matmul_precision("highest"):
        g_hi = jax.jit(jax.grad(loss_ref))(params)
    g_pal = jax.grad(loss_pal)(params)
    g_def = jax.grad(loss_ref)(params)

    def rel(a, b):
        return max(
            float(jnp.max(jnp.abs(x - y)) / (jnp.max(jnp.abs(x)) + 1e-6))
            for x, y in zip(jax.tree_util.tree_leaves(a),
                            jax.tree_util.tree_leaves(b)))

    gerr, gerr_xla = rel(g_hi, g_pal), rel(g_hi, g_def)
    print(f"fused_mlp_score bwd max rel err vs highest-precision XLA: "
          f"pallas={gerr:.2e}, default-XLA={gerr_xla:.2e}", flush=True)
    assert gerr < max(5e-2, 3 * gerr_xla), (gerr, gerr_xla)

    # fused softmax loss
    s = jax.random.normal(k3, (BATCH, LIST_SIZE))
    y = (jax.random.uniform(k4, (BATCH, LIST_SIZE)) < 0.3).astype(jnp.float32)
    w = 1.0 + jax.random.uniform(k1, (BATCH, LIST_SIZE))
    m = jnp.ones((BATCH, LIST_SIZE)).at[:, -2:].set(0.0)
    ref_l = losses.softmax_loss(s, y, w, m)
    got_l = fused_softmax_loss(s, y, w, m, interpret=False)
    lerr = float(jnp.abs(ref_l - got_l))
    g_ref = jax.grad(lambda s: losses.softmax_loss(s, y, w, m))(s)
    g_pal = jax.grad(lambda s: fused_softmax_loss(
        s, y, w, m, interpret=False))(s)
    glerr = float(jnp.max(jnp.abs(g_ref - g_pal)))
    print(f"fused_softmax_loss fwd |err| = {lerr:.2e} bwd max|err| = "
          f"{glerr:.2e}", flush=True)
    assert lerr < 1e-5 and glerr < 1e-5, (lerr, glerr)

    # pallas click sim: statistical parity vs jnp sampler
    model = cm.make_click_model("pbm", 0.1, 1.0, 4, 1.0)
    N = 8192
    labels = jnp.tile(jnp.arange(LIST_SIZE) % 3, (N, 1)).astype(jnp.float32)
    mask = jnp.ones((N, LIST_SIZE))
    pal = pallas_sample_pbm_clicks(model, jax.random.PRNGKey(7), labels,
                                   mask, interpret=False)
    jnp_clicks, _, _ = cm.sample_clicks(model, jax.random.PRNGKey(8),
                                        labels, mask)
    diff = float(jnp.max(jnp.abs(pal.mean(0) - jnp_clicks.mean(0))))
    print(f"pallas_pbm_clicks per-pos rate max|diff| = {diff:.4f} "
          f"(rates {np.asarray(pal.mean(0)).round(3).tolist()})", flush=True)
    assert diff < 0.03, diff
    print("part 1 OK", flush=True)


def part2_micro(iters):
    import jax
    import jax.numpy as jnp

    from ultra_pytorch_tpu.models.dnn import DNN
    from ultra_pytorch_tpu.ops import losses
    from ultra_pytorch_tpu.ops.pallas.mlp import fused_mlp_score
    from ultra_pytorch_tpu.ops.pallas.listwise_loss import fused_softmax_loss
    from ultra_pytorch_tpu.ops.pallas.click_sim import pallas_sample_pbm_clicks
    from ultra_pytorch_tpu.sim import click_models as cm

    print("== part 2: microbenchmarks (per call, fwd+bwd where applicable)",
          flush=True)
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    ranker = DNN("hidden_layer_sizes=[512, 256, 128]")
    params = ranker.init(k1, FEATURES)
    feats = jax.random.normal(k2, (BATCH, LIST_SIZE, FEATURES))
    results = {}

    f_ref = jax.jit(lambda p, x: ranker.apply(p, x))
    f_pal = jax.jit(lambda p, x: fused_mlp_score(p["layers"], x,
                                                 interpret=False))
    results["mlp_fwd_xla_us"] = _timeit(lambda: f_ref(params, feats),
                                        iters) * 1e6
    results["mlp_fwd_pallas_us"] = _timeit(lambda: f_pal(params, feats),
                                           iters) * 1e6

    g_ref = jax.jit(jax.grad(lambda p, x: jnp.sum(ranker.apply(p, x) ** 2)))
    g_pal = jax.jit(jax.grad(lambda p, x: jnp.sum(
        fused_mlp_score(p["layers"], x, interpret=False) ** 2)))
    results["mlp_grad_xla_us"] = _timeit(lambda: g_ref(params, feats),
                                         iters) * 1e6
    results["mlp_grad_pallas_us"] = _timeit(lambda: g_pal(params, feats),
                                            iters) * 1e6

    s = jax.random.normal(k1, (BATCH, LIST_SIZE))
    y = (jax.random.uniform(k2, (BATCH, LIST_SIZE)) < 0.3).astype(jnp.float32)
    w = 1.0 + jax.random.uniform(k1, (BATCH, LIST_SIZE))
    m = jnp.ones((BATCH, LIST_SIZE))
    l_ref = jax.jit(jax.grad(lambda s: losses.softmax_loss(s, y, w, m)))
    l_pal = jax.jit(jax.grad(lambda s: fused_softmax_loss(
        s, y, w, m, interpret=False)))
    results["loss_grad_xla_us"] = _timeit(lambda: l_ref(s), iters) * 1e6
    results["loss_grad_pallas_us"] = _timeit(lambda: l_pal(s), iters) * 1e6

    model = cm.make_click_model("pbm", 0.1, 1.0, 4, 1.0)
    labels = jnp.tile(jnp.arange(LIST_SIZE) % 3, (BATCH, 1)).astype(
        jnp.float32)
    mask = jnp.ones((BATCH, LIST_SIZE))
    c_ref = jax.jit(lambda k: cm.sample_clicks(model, k, labels, mask)[0])
    c_pal = jax.jit(lambda k: pallas_sample_pbm_clicks(
        model, k, labels, mask, interpret=False))
    key = jax.random.PRNGKey(3)
    results["click_xla_us"] = _timeit(lambda: c_ref(key), iters) * 1e6
    results["click_pallas_us"] = _timeit(lambda: c_pal(key), iters) * 1e6

    for k, v in results.items():
        print(f"  {k:26s} {v:10.2f}", flush=True)
    return results


def _dla_qps(steps, ranker_extra="", algo_extra="", feed_extra=""):
    from tools.bench_common import make_bench_setup, time_chunks

    alg, feed, dev = make_bench_setup(
        batch=BATCH, list_size=LIST_SIZE, features=FEATURES,
        ranker_extra=ranker_extra, algo_extra=algo_extra,
        feed_extra=feed_extra)
    return time_chunks(alg, feed, dev, steps, 25, FEATURES)


def part3_e2e(steps):
    print("== part 3: end-to-end DLA step (queries/s), scan window 25",
          flush=True)
    combos = [
        ("all_off", "", "", ""),
        ("pallas_mlp", ",use_pallas=true", "", ""),
        ("fused_loss", "", "loss_func=fused_softmax_loss", ""),
        ("pallas_click", "", "", ",use_pallas_click=true"),
        ("all_on", ",use_pallas=true", "loss_func=fused_softmax_loss",
         ",use_pallas_click=true"),
        ("bf16", ",compute_dtype=bfloat16", "", ""),
        # r2/r3 feed behavior (9 redraw rounds/slot) vs the r4 default
        # rejection-compaction pool — quantifies the compact win.
        ("rounds_resample", "", "", ",resample_strategy=rounds"),
    ]
    results = {}
    for name, r, a, f in combos:
        print(f"  {name}:", flush=True)
        qps = _dla_qps(steps, r, a, f)
        results[name] = qps
        base = results["all_off"]
        print(f"  {name:14s} {qps:12.0f} q/s  "
              f"({qps / base - 1:+.1%} vs all_off)", flush=True)
    print(json.dumps({k: round(v, 1) for k, v in results.items()}),
          flush=True)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--micro", type=int, default=200)
    ap.add_argument("--parts", default="123")
    args = ap.parse_args(argv)
    if "1" in args.parts:
        part1_correctness()
    if "2" in args.parts:
        part2_micro(args.micro)
    if "3" in args.parts:
        part3_e2e(args.steps)


if __name__ == "__main__":
    main()
