"""Roofline / MFU accounting for the DLA train step (VERDICT r2 #3).

Answers "what fraction of the chip does the headline queries/s use, and
what bounds it" with the COMPILER's own numbers: XLA's cost analysis of
the exact compiled scan-window program (flops + bytes accessed), divided
by measured wall time, against the chip's peak FLOP/s and HBM bandwidth.

Outputs (JSON): flops/query, bytes/query, achieved TFLOP/s and GB/s,
MFU vs bf16 peak, arithmetic intensity, the roofline-implied floor for
each resource, and which resource bounds the step.

Peaks default to the v5e public datasheet figures and are overridable:
  ULTRA_PEAK_BF16_TFLOPS (197), ULTRA_PEAK_HBM_GBS (819).
Note: this protocol's matmuls run in f32 (bench default); f32 on the MXU
is ~1/2.5 the bf16 rate, so "MFU vs bf16 peak" is the conservative
denominator — both are printed.

Usage (TPU, one process at a time):
  python tools/roofline.py [--batch 256] [--list-size 10] [--features 136]
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

if os.environ.get("ULTRA_PLATFORM"):  # e.g. cpu for mechanics testing
    import jax

    jax.config.update("jax_platforms", os.environ["ULTRA_PLATFORM"])

PEAK_BF16 = float(os.environ.get("ULTRA_PEAK_BF16_TFLOPS", "197")) * 1e12
PEAK_HBM = float(os.environ.get("ULTRA_PEAK_HBM_GBS", "819")) * 1e9


def analyze(batch=256, list_size=10, features=136, chunk=50, steps=400,
            prng="rbg", ranker_extra="", timed=True):
    import jax

    jax.config.update("jax_default_prng_impl", prng)

    from tools.bench_common import make_bench_setup, make_run_chunk

    alg, feed, dev = make_bench_setup(
        batch=batch, list_size=list_size, features=features,
        ranker_extra=ranker_extra)
    run_chunk = make_run_chunk(alg, feed, chunk)
    state = alg.init_state(jax.random.PRNGKey(0), features)
    rng = jax.random.PRNGKey(1)

    # Cost from the SINGLE-step program (chunk=1, no lax.scan): XLA's cost
    # analysis counts a while-loop body ONCE regardless of trip count, so
    # a scanned chunk's reported flops equal one iteration's — empirically
    # verified (the chunk=50 report matches the hand-computed single-step
    # FLOPs exactly). Timing still uses the scanned chunk below, which is
    # what production runs dispatch.
    single = make_run_chunk(alg, feed, 1)
    cost = single.lower(state, rng, dev).compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0]
    flops_step = float(cost.get("flops", 0.0))
    bytes_step = float(cost.get("bytes accessed", 0.0))

    out = {
        "protocol": {"batch": batch, "list_size": list_size,
                     "features": features, "chunk": chunk, "prng": prng},
        "flops_per_step": flops_step,
        "flops_per_query": flops_step / batch,
        "bytes_per_step": bytes_step,
        "bytes_per_query": bytes_step / batch,
        "arithmetic_intensity": (flops_step / bytes_step
                                 if bytes_step else float("nan")),
    }
    if not timed:
        return out

    # Warm up (executes the already-compiled program), then time.
    state, rng, loss = run_chunk(state, rng, dev)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    n_chunks = max(steps // chunk, 1)
    for _ in range(n_chunks):
        state, rng, loss = run_chunk(state, rng, dev)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    step_s = dt / (n_chunks * chunk)
    qps = batch / step_s

    achieved_flops = flops_step / step_s
    achieved_bw = bytes_step / step_s
    compute_floor = flops_step / PEAK_BF16
    memory_floor = bytes_step / PEAK_HBM
    out.update({
        "queries_per_sec": qps,
        "step_time_us": step_s * 1e6,
        "achieved_tflops": achieved_flops / 1e12,
        "achieved_hbm_gbs": achieved_bw / 1e9,
        "mfu_vs_bf16_peak": achieved_flops / PEAK_BF16,
        # This protocol's matmuls are f32; the v5e MXU runs f32 at ~1/4
        # its bf16 rate, so this is utilization of the rate the chosen
        # dtype can actually reach.
        "mfu_vs_f32_rate": achieved_flops / (PEAK_BF16 / 4),
        "hbm_utilization": achieved_bw / PEAK_HBM,
        # Roofline floors: the minimum step time each resource alone
        # allows. CAVEAT on bytes: XLA's "bytes accessed" is PRE-FUSION
        # logical operand/output bytes — an upper bound on true HBM
        # traffic (fusion keeps intermediates in VMEM). When the implied
        # memory floor exceeds the MEASURED step time, the hardware has
        # already proven the bytes over-counted; the honest bound is then
        # the compute floor + non-matmul (VPU/PRNG/gather) work.
        "compute_floor_us_bf16": compute_floor * 1e6,
        "compute_floor_us_f32": compute_floor * 4 * 1e6,
        "memory_floor_us_upper_bound": memory_floor * 1e6,
        "bytes_overcounted": bool(memory_floor > step_s),
        "headroom_vs_f32_compute_floor_x": step_s / (compute_floor * 4),
    })
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--list-size", type=int, default=10)
    p.add_argument("--features", type=int, default=136)
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--prng", default="rbg")
    p.add_argument("--ranker-extra", default="",
                   help="e.g. ',compute_dtype=bfloat16'")
    p.add_argument("--no-time", action="store_true",
                   help="cost analysis only (no TPU run)")
    args = p.parse_args()
    out = analyze(args.batch, args.list_size, args.features, args.chunk,
                  args.steps, args.prng, args.ranker_extra,
                  timed=not args.no_time)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
