"""End-to-end serving benchmark THROUGH the HTTP stack (VERDICT r2 #6).

tools/bench_serve.py times the device path (`Scorer._score_ranked`);
this tool measures what a client actually sees: N concurrent HTTP
clients x M requests each, through ThreadingHTTPServer + MicroBatcher,
reporting q/s, p50/p99 request latency, and the coalescing factor
(requests per device call) — the number that backs the "micro-batching
amortizes the dispatch floor" claim in BASELINE.md. Run once with
micro-batching and once with the lock-serialized path for the delta.

Usage (TPU for real numbers; ULTRA_PLATFORM=cpu for mechanics):
  python tools/bench_serve_http.py [--clients 16] [--requests 8]
      [--queries 8] [--list-size 16] [--features 136]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/ultra_tpu_jax"))

if os.environ.get("ULTRA_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["ULTRA_PLATFORM"])


def make_scorer(features: int, use_pallas=None):
    """Random-weight DNN scorer (serving perf does not depend on weights)."""
    import jax

    from ultra_pytorch_tpu.models.dnn import DNN
    from ultra_pytorch_tpu.serve.scorer import Scorer

    hp = "hidden_layer_sizes=[512,256,128]"
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        hp += ",use_pallas=true"
    ranker = DNN(hp, features)
    params = ranker.init(jax.random.PRNGKey(0), features)
    return Scorer(ranker, params, features)


def drive(base: str, payload: bytes, clients: int, requests: int):
    """Fire clients x requests concurrent POSTs; returns latencies (s)."""
    latencies = [[] for _ in range(clients)]
    errors = []
    barrier = threading.Barrier(clients + 1)

    def client(ci):
        barrier.wait()
        for _ in range(requests):
            req = urllib.request.Request(
                f"{base}/v1/rank", data=payload,
                headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=600) as r:
                    r.read()
            except Exception as exc:  # noqa: BLE001 — recorded, not raised
                errors.append(repr(exc))
                continue
            latencies[ci].append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    flat = sorted(x for c in latencies for x in c)
    return flat, wall, errors


def bench(scorer, clients, requests, queries, list_size, batch_requests):
    import numpy as np

    from ultra_pytorch_tpu.serve.batching import MicroBatcher
    from ultra_pytorch_tpu.serve.http_service import make_server

    batcher = MicroBatcher(scorer) if batch_requests else None
    server = make_server(scorer, port=0, batcher=batcher)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.server_address
        base = f"http://{host}:{port}"
        rng = np.random.default_rng(0)
        payload = json.dumps({"queries": rng.normal(size=(
            queries, list_size, scorer.feature_size)).tolist()}).encode()

        # Warm every reachable bucket (coalescing pads bursts into LARGER
        # batch buckets than any single request; an unwarmed bucket would
        # put an XLA compile on the timed path — exactly what a production
        # server's --warmup flags prevent), then burst.
        scorer.warmup(min(clients * queries, 256), list_size)
        drive(base, payload, 1, 1)
        flat, wall, errors = drive(base, payload, clients, requests)
        n_req = len(flat)
        out = {
            "error_samples": sorted(set(errors))[:3],
            "mode": "micro_batched" if batch_requests else "lock_serialized",
            "clients": clients,
            "requests_total": clients * requests,
            "errors": len(errors),
            "queries_per_request": queries,
            "list_size": list_size,
            "wall_s": round(wall, 3),
            "queries_per_sec": round(n_req * queries / wall, 1),
            "latency_p50_ms": round(1e3 * flat[n_req // 2], 1),
            "latency_p99_ms": round(1e3 * flat[min(n_req - 1,
                                                   int(n_req * 0.99))], 1),
        }
        if batcher is not None:
            out["device_calls"] = batcher.device_calls - 1  # minus warmup
            out["coalescing_factor"] = round(
                n_req / max(out["device_calls"], 1), 2)
        return out
    finally:
        server.shutdown()
        if batcher is not None:
            batcher.close()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=8)
    p.add_argument("--queries", type=int, default=8)
    p.add_argument("--list-size", type=int, default=16)
    p.add_argument("--features", type=int, default=136)
    p.add_argument("--no-pallas", action="store_true")
    args = p.parse_args()
    scorer = make_scorer(args.features,
                         use_pallas=False if args.no_pallas else None)
    for batched in (False, True):
        out = bench(scorer, args.clients, args.requests, args.queries,
                    args.list_size, batched)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
