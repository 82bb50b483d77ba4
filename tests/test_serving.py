"""Serving subsystem: checkpoint-loading Scorer + local HTTP service.

New capability vs the reference (no serving path there; closest surface is
``main.py --test_only``, ref ``main.py:216-257``). Covers: metadata-only
checkpoint loading, score parity with the training-side scorer, bucket
padding invariance, ranking semantics with ragged lists, and an HTTP
round-trip against a live threaded server.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    """Train DLA/DNN a few steps on toy data and save a checkpoint."""
    from tools.make_toy_data import main as make_main
    from ultra_pytorch_tpu.run.experiment import Experiment

    data_dir = tmp_path_factory.mktemp("servedata")
    make_main([str(data_dir), "--queries", "24", "--features", "64"])
    model_dir = tmp_path_factory.mktemp("servemodel")
    settings = {
        "train_input_feed": "ClickSimulationFeed",
        "train_input_hparams": "",
        "valid_input_feed": "DirectLabelFeed",
        "valid_input_hparams": "",
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[16,8]",
        "learning_algorithm": "DLA",
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg"],
        "metrics_topn": [5],
        "objective_metric": "ndcg_5",
        "selection_bias_cutoff": 5,
    }
    exp = Experiment(settings, str(data_dir), str(model_dir),
                     batch_size=8, seed=0, dp=0)
    exp.setup(splits=("train", "valid"))
    exp.init_state()
    exp.train_steps(4)
    exp.save({"step": 4})
    return exp, str(model_dir)


@pytest.fixture(scope="module")
def scorer(trained_model):
    from ultra_pytorch_tpu.serve import Scorer

    _, model_dir = trained_model
    # Metadata-only load: no settings file, no feature_size argument.
    return Scorer.from_checkpoint(model_dir)


def test_from_checkpoint_matches_training_scorer(trained_model, scorer):
    """Serving scores == the Experiment's own eval scores (same params)."""
    import jax

    exp, _ = trained_model
    ds = exp.datasets["valid"]
    dev = exp.device_data["valid"]
    batch = dev.gather(np.arange(4))
    train_side = np.asarray(jax.jit(
        lambda s, b: exp.algorithm.score(s, b))(exp.state, batch))

    feats = np.asarray(batch["features"])
    n_valid = np.asarray(batch["mask"]).sum(axis=1).astype(int)
    serve_side = scorer.score(feats, n_valid)
    for i, n in enumerate(n_valid):
        np.testing.assert_allclose(serve_side[i, :n], train_side[i, :n],
                                   rtol=1e-5, atol=1e-5)
    assert ds.feature_size == scorer.feature_size


def test_bucket_padding_invariance(scorer):
    """Same query scored alone, in a big batch, and under a larger list
    bucket must produce identical scores (padding never leaks)."""
    rng = np.random.default_rng(0)
    f = scorer.feature_size
    one = rng.normal(size=(1, 5, f)).astype(np.float32)
    alone = scorer.score(one, [5])

    big = np.concatenate([one] + [rng.normal(size=(1, 5, f)).astype(
        np.float32) for _ in range(20)], axis=0)  # batch bucket 32
    in_batch = scorer.score(big, [5] * 21)
    np.testing.assert_allclose(in_batch[0], alone[0], rtol=1e-5, atol=1e-6)

    wide = np.zeros((1, 17, f), np.float32)  # list bucket 32
    wide[:, :5] = one
    in_wide = scorer.score(wide, [5])
    np.testing.assert_allclose(in_wide[0, :5], alone[0, :5],
                               rtol=1e-5, atol=1e-6)
    assert (in_wide[0, 5:] < -1e29).all(), "masked positions not -inf"


def test_rank_ragged_lists(scorer):
    """rank() orders by score desc and keeps invalid docs at the tail."""
    rng = np.random.default_rng(1)
    f = scorer.feature_size
    feats = rng.normal(size=(3, 7, f)).astype(np.float32)
    n_valid = [7, 3, 5]
    scores = scorer.score(feats, n_valid)
    order = scorer.rank(feats, n_valid)
    for i, n in enumerate(n_valid):
        row = order[i]
        assert sorted(row.tolist()) == list(range(7))
        ranked_scores = scores[i, row[:n]]
        assert (np.diff(ranked_scores) <= 1e-6).all(), "not score-sorted"
        assert set(row[:n].tolist()) == set(range(n)), \
            "invalid docs ranked above valid ones"


def test_compile_cache_buckets(scorer):
    """Requests within one bucket reuse one compiled program."""
    f = scorer.feature_size
    scorer._compiled.clear()
    for q, li in [(2, 5), (5, 7), (8, 8), (3, 6)]:
        scorer.score(np.zeros((q, li, f), np.float32))
    assert len(scorer._compiled) == 1, list(scorer._compiled)


def test_use_pallas_scoring_parity(trained_model, scorer):
    """The fused-kernel serving path (interpret mode on CPU) matches the
    plain XLA scorer on the same checkpoint."""
    from ultra_pytorch_tpu.serve import Scorer

    _, model_dir = trained_model
    pallas_scorer = Scorer.from_checkpoint(model_dir, use_pallas=True)
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(2, 6, scorer.feature_size)).astype(np.float32)
    n_valid = [6, 4]
    np.testing.assert_allclose(pallas_scorer.score(feats, n_valid),
                               scorer.score(feats, n_valid),
                               rtol=1e-4, atol=1e-4)


def test_microbatcher_parity_and_coalescing(scorer):
    """Concurrent submits return per-request results identical to direct
    scoring, and bursts coalesce into fewer device calls."""
    from concurrent.futures import ThreadPoolExecutor

    from ultra_pytorch_tpu.serve import MicroBatcher

    rng = np.random.default_rng(4)
    f = scorer.feature_size
    reqs = [(rng.normal(size=(rng.integers(1, 4), li, f)
                        ).astype(np.float32), li)
            for li in (4, 6, 3, 6, 5, 4, 7, 3)]
    batcher = MicroBatcher(scorer, max_delay_s=0.05)
    try:
        with ThreadPoolExecutor(8) as pool:
            futs = [pool.submit(batcher.submit, feats) for feats, _ in reqs]
            got = [fut.result(timeout=60) for fut in futs]
        assert batcher.device_calls < len(reqs), \
            "burst did not coalesce at all"
        for (feats, li), (scores, order) in zip(reqs, got):
            direct_s, direct_o = scorer._score_ranked(feats, None)
            np.testing.assert_allclose(scores, direct_s, rtol=1e-5,
                                       atol=1e-6)
            np.testing.assert_array_equal(order, direct_o)
    finally:
        batcher.close()


def test_microbatcher_error_propagates(scorer, monkeypatch):
    from ultra_pytorch_tpu.serve import MicroBatcher

    batcher = MicroBatcher(scorer, max_delay_s=0.0)
    try:
        # Bad feature dim fails fast in the caller's thread.
        with pytest.raises(ValueError, match="feature size"):
            batcher.submit(np.zeros((1, 3, scorer.feature_size + 1),
                                    np.float32))
        # A worker-side failure propagates to the caller...
        real = scorer._score_ranked
        boom = {"armed": True}

        def flaky(feats, n_valid):
            if boom.pop("armed", False):
                raise RuntimeError("device fell over")
            return real(feats, n_valid)

        monkeypatch.setattr(scorer, "_score_ranked", flaky)
        with pytest.raises(RuntimeError, match="device fell over"):
            batcher.submit(np.zeros((1, 3, scorer.feature_size),
                                    np.float32))
        # ...and the worker survives it and keeps serving.
        scores, _ = batcher.submit(
            np.zeros((1, 3, scorer.feature_size), np.float32))
        assert scores.shape == (1, 3)
    finally:
        batcher.close()


def test_http_round_trip(scorer):
    from ultra_pytorch_tpu.serve import make_server

    server = make_server(scorer, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.server_address
        base = f"http://{host}:{port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health == {"status": "ok",
                          "feature_size": scorer.feature_size}

        rng = np.random.default_rng(2)
        queries = [rng.normal(size=(4, scorer.feature_size)).tolist(),
                   rng.normal(size=(2, scorer.feature_size)).tolist()]
        req = urllib.request.Request(
            f"{base}/v1/rank",
            data=json.dumps({"queries": queries}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert len(out["ranked"]) == 2
        assert sorted(out["ranked"][0]) == [0, 1, 2, 3]
        assert sorted(out["ranked"][1]) == [0, 1]
        assert len(out["scores"][0]) == 4 and len(out["scores"][1]) == 2
        # Direct-scorer parity for the first query.
        direct = scorer.score(
            np.asarray(queries[0], np.float32)[None], [4])[0]
        np.testing.assert_allclose(out["scores"][0], direct, rtol=1e-5,
                                   atol=1e-6)

        # Malformed request -> 400, not a crash.
        bad = urllib.request.Request(
            f"{base}/v1/rank", data=b'{"queries": [[[1, 2]]]}',
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad, timeout=30)
        assert exc.value.code == 400
    finally:
        server.shutdown()


def _post(base, payload, timeout=30):
    req = urllib.request.Request(
        f"{base}/v1/rank", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def test_http_request_limits_and_scoring_errors(scorer, monkeypatch):
    """Oversized requests are rejected (413/400) before touching the
    device, and a scoring-time failure returns a JSON 500 instead of a
    dropped connection (ADVICE r2)."""
    from ultra_pytorch_tpu.serve import make_server

    server = make_server(scorer, port=0, max_body_bytes=10_000,
                         max_queries=2, max_list_len=4)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.server_address
        base = f"http://{host}:{port}"
        f = scorer.feature_size
        ok_q = [[0.0] * f] * 2

        # Too many queries -> 400.
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(base, {"queries": [ok_q, ok_q, ok_q]})
        assert exc.value.code == 400
        assert b"queries exceeds" in exc.value.read()

        # Too long a candidate list -> 400.
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(base, {"queries": [[[0.0] * f] * 5]})
        assert exc.value.code == 400
        assert b"docs exceeds" in exc.value.read()

        # Oversized body -> 413 before parsing.
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(base, {"queries": [[[0.5] * f] * 4] * 2,
                         "pad": "x" * 20_000})
        assert exc.value.code == 413

        # A scoring-time exception -> JSON 500, and the server survives.
        def boom(feats, n_valid):
            raise RuntimeError("device fell over")

        monkeypatch.setattr(scorer, "_score_ranked", boom)
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(base, {"queries": [ok_q]})
        assert exc.value.code == 500
        assert b"device fell over" in exc.value.read()
        monkeypatch.undo()
        with _post(base, {"queries": [ok_q]}) as r:
            assert len(json.loads(r.read())["ranked"]) == 1
    finally:
        server.shutdown()


def test_microbatcher_submit_timeout(scorer, monkeypatch):
    """A wedged device call surfaces as TimeoutError in the caller instead
    of an indefinite hang, and close() fails still-queued items."""
    import time

    from ultra_pytorch_tpu.serve import MicroBatcher

    release = threading.Event()

    def wedged(feats, n_valid):
        release.wait(10)
        raise RuntimeError("late")

    monkeypatch.setattr(scorer, "_score_ranked", wedged)
    batcher = MicroBatcher(scorer, max_delay_s=0.0, submit_timeout_s=0.2)
    try:
        f = scorer.feature_size
        t0 = time.monotonic()
        with pytest.raises(TimeoutError, match="not served"):
            batcher.submit(np.zeros((1, 3, f), np.float32))
        assert time.monotonic() - t0 < 5
        # Queue another item behind the wedged call, then close: the item
        # must be failed, not left hanging.
        from ultra_pytorch_tpu.serve.batching import _Pending
        stuck = _Pending(np.zeros((1, 3, f), np.float32),
                         np.asarray([3], np.int32))
        with batcher._cv:
            batcher._queue.append(stuck)
        batcher.close()
        assert stuck.event.is_set() and stuck.error is not None
    finally:
        release.set()
