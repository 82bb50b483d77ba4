"""Data-parallel scaling-efficiency benchmark.

Runs the fused DLA train step over meshes of 1, 2, 4, ... devices (all
local devices by default) and reports queries/sec and scaling efficiency
relative to the single-device run. On a multi-chip v5e slice this measures
real ICI scaling; on a single-chip host it degenerates to the 1-device
row. Use XLA_FLAGS=--xla_force_host_platform_device_count=8 with
ULTRA_PLATFORM=cpu to exercise the mechanics on a virtual mesh.

Usage: python tools/bench_scaling.py [steps_per_window] [windows]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/ultra_tpu_jax"))


def main(window=25, windows=4):
    import jax

    if os.environ.get("ULTRA_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ULTRA_PLATFORM"])

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _exp_settings, _make_synthetic
    from ultra_pytorch_tpu.input_layer.feeds import ClickSimulationFeed
    from ultra_pytorch_tpu.parallel import (
        make_dp_train_step, make_mesh, shard_dataset)
    from ultra_pytorch_tpu.run.experiment import create_algorithm
    from ultra_pytorch_tpu.sim.click_models import click_model_json_numpy
    import tempfile

    n_dev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]
    batch = 256

    ds = _make_synthetic(num_queries=4096, list_size=10, feature_size=136)
    settings = _exp_settings(10)

    results = []
    with tempfile.TemporaryDirectory() as td:
        cm_path = os.path.join(td, "pbm.json")
        with open(cm_path, "w") as fout:
            json.dump(click_model_json_numpy("pbm", 0.1, 1.0, 4, 1.0), fout)

        for n in sizes:
            alg = create_algorithm(settings, ds.feature_size, ds.max_label)
            mesh = make_mesh(n)
            dev = shard_dataset(ds.to_device(), mesh)
            feed = ClickSimulationFeed(
                alg, batch, f"click_model_json={cm_path}", dev)
            # Scan-fused window — the same dispatch amortization the
            # Experiment driver uses (one host dispatch per `window` steps).
            step = make_dp_train_step(alg, feed, mesh, window=window)
            state = alg.init_state(jax.random.PRNGKey(0), ds.feature_size)
            rng = jax.random.PRNGKey(1)

            # warmup / compile
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, sub, dev)
            jax.block_until_ready(metrics["loss"])

            t0 = time.perf_counter()
            for _ in range(windows):
                rng, sub = jax.random.split(rng)
                state, metrics = step(state, sub, dev)
            jax.block_until_ready(metrics["loss"])
            dt = time.perf_counter() - t0
            qps = window * windows * batch / dt
            results.append((n, qps))
            base = results[0][1]
            eff = qps / (base * n)
            print(json.dumps({
                "devices": n, "queries_per_sec": round(qps, 1),
                "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
