"""Benchmark: DLA training throughput (queries/sec) on one chip.

Protocol mirrors the reference's reproducible configuration
(ref ``main.py:42-56`` + ``example/offline_setting/dla_exp_settings.json``):
batch 256, selection_bias_cutoff 10, DNN [512, 256, 128], 136 features,
PBM eta=1.0 click simulation — the full fused pipeline (query sampling,
on-device feature gather, click simulation, dual-tower DLA update) per step.
The harness lives in tools/bench_common.py (shared with bench_exp /
bench_pallas / profile_step so every published table runs the SAME code).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "queries/s", "vs_baseline": N}

``vs_baseline`` compares against the reference PyTorch implementation's
measured throughput on this machine's CPU (see BASELINE.md; the reference
has no accelerator path on TPU hosts and no published numbers).
"""

from __future__ import annotations

import json
import os

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/ultra_tpu_jax"))

# Reference throughput (queries/s) of ULTRA_pytorch DLA/DNN/batch-256 on this
# host's CPU, measured via tools/bench_reference.py -> BASELINE.md.
REFERENCE_QPS = float(os.environ.get("ULTRA_REF_QPS", "2142"))

BATCH = 256
LIST_SIZE = 10
FEATURES = 136
BENCH_STEPS = 2400
CHUNK = 800  # steps per dispatch (lax.scan window). A PROTOCOL knob
#              (dispatch amortization, not a code win — the same
#              amortization the driver gets from larger checkpoint
#              windows, and the r5 pipelined driver hides readback even
#              at 500-step windows). Same-session ladder, r5:
#              400/800/1600 = 1.87/2.02/2.08M q/s; 800 adopted as the
#              operating point (BASELINE.md r5 note). 3 timed
#              dispatches; warmup is ONE chunk.


def main():
    import jax

    # TPU hardware PRNG (XLA RngBitGenerator) instead of threefry: the
    # counter-based threefry keygen/uniforms cost ~80us of the ~310us step
    # at these shapes; rbg is +25% end-to-end (tools/bench_exp.py,
    # BASELINE.md). Statistically sound; streams are not bit-stable across
    # compiler versions, which a throughput benchmark doesn't need.
    jax.config.update("jax_default_prng_impl", "rbg")

    from tools.bench_common import make_bench_setup, time_chunks

    alg, feed, dev = make_bench_setup(
        batch=BATCH, list_size=LIST_SIZE, features=FEATURES)
    qps = time_chunks(alg, feed, dev, BENCH_STEPS, CHUNK, FEATURES,
                      verbose=False)
    print(json.dumps({
        "metric": "dla_dnn_train_throughput",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / REFERENCE_QPS, 2),
    }))


if __name__ == "__main__":
    main()
