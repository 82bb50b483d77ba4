"""Fused validation path: the scan-fused full-batch pass + tail batch must
reproduce the naive per-batch loop exactly (VERDICT r2 #5), and the
tie-break rng must change only tied orderings (r2 #7 decision: shuffle
ties ON by default, keyed by (seed, step) for reproducibility)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def exp(tmp_path_factory):
    from tools.make_toy_data import main as make_main
    from ultra_pytorch_tpu.run.experiment import Experiment

    data_dir = tmp_path_factory.mktemp("fuseddata")
    # 40 valid queries / batch 16 -> 2 full scan batches + tail of 8.
    make_main([str(data_dir), "--queries", "40", "--features", "32"])
    settings = {
        "train_input_feed": "ClickSimulationFeed",
        "train_input_hparams": "",
        "valid_input_feed": "DirectLabelFeed",
        "valid_input_hparams": "",
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[8]",
        "learning_algorithm": "NaiveAlgorithm",
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg", "mrr", "map"],
        "metrics_topn": [3, 10],
        "objective_metric": "ndcg_10",
        "selection_bias_cutoff": 5,
        "eval_shuffle_ties": False,
    }
    e = Experiment(settings, str(data_dir),
                   str(tmp_path_factory.mktemp("fusedmodel")),
                   batch_size=16, seed=3, dp=0)
    e.setup(splits=("train", "valid"))
    e.init_state()
    e.train_steps(3)
    return e


def _naive_validate(exp, split="valid"):
    """Reference implementation: python loop over eval batches."""
    import jax

    from ultra_pytorch_tpu.data.dataset import merge_summary

    alg = exp.algorithm
    eval_fn = jax.jit(
        lambda state, batch, rng: alg.validation_metrics(state, batch,
                                                         rng=rng))
    summaries, counts = [], []
    for batch, _, count in exp.feeds[split].eval_batches():
        _, summary = eval_fn(exp.state, batch, None)
        summaries.append({k: float(v) for k, v in summary.items()})
        counts.append(count)
    return merge_summary(summaries, counts)


def test_fused_matches_per_batch_loop(exp):
    fused = exp.validate("valid")
    naive = _naive_validate(exp)
    assert set(fused) == set(naive)
    for k in fused:
        np.testing.assert_allclose(fused[k], naive[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)


def test_shuffle_ties_only_perturbs_ties(exp):
    """With trained (tie-free) scores, shuffle-ties on/off agree; with an
    all-tied scorer, the rng unbiases the ranking away from initial order."""
    import jax.numpy as jnp

    def _drop_eval_cache():
        for k in [k for k in exp._compiled
                  if isinstance(k, tuple) and k[0] == "validate_fused"]:
            exp._compiled.pop(k)

    exp.exp_settings["eval_shuffle_ties"] = True
    _drop_eval_cache()
    try:
        with_rng = exp.validate("valid")
    finally:
        exp.exp_settings["eval_shuffle_ties"] = False
        _drop_eval_cache()
    without = exp.validate("valid")
    for k in with_rng:
        np.testing.assert_allclose(with_rng[k], without[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)

    # Degenerate scorer: all scores equal. Deterministic sort pins the
    # metric to exactly the initial-order value every time; the rng path
    # must produce a different (shuffled) ordering.
    from ultra_pytorch_tpu.metrics import ranking as metrics_lib
    import jax

    labels = jnp.asarray(
        np.tile(np.asarray([1.0, 0.0, 0.0, 0.0, 0.0]), (6, 1)))
    preds = jnp.zeros_like(labels)
    det = metrics_lib.evaluate(labels, preds, ["ndcg"], [5], max_label=2.0)
    shuf = metrics_lib.evaluate(labels, preds, ["ndcg"], [5], max_label=2.0,
                                rng=jax.random.PRNGKey(0))
    assert float(det["ndcg_5"]) == pytest.approx(1.0)  # initial-order bias
    assert float(shuf["ndcg_5"]) < 1.0 - 1e-4


def test_online_reward_logged_for_online_feeds(exp, tmp_path):
    """PDGD trained through an online simulation feed logs `online_reward`
    (mean clicks on the shown list); supervised/offline batches don't."""
    import jax

    from ultra_pytorch_tpu.input_layer.feeds import (
        StochasticOnlineSimulationFeed)
    from ultra_pytorch_tpu.run.experiment import create_algorithm

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    settings = dict(exp.exp_settings, learning_algorithm="PDGD",
                    learning_algorithm_hparams="")
    alg = create_algorithm(settings, exp.datasets["train"].feature_size,
                           exp.max_label)
    dev = exp.device_data["train"]
    feed = StochasticOnlineSimulationFeed(
        alg, 8,
        f"click_model_json={repo}/example/ClickModel/"
        "pbm_0.1_1.0_4_1.0.json", dev)
    state = alg.init_state(jax.random.PRNGKey(0), dev.feature_size)
    batch = feed.train_batch(jax.random.PRNGKey(1), state, dev)
    assert "relevance" in batch  # online-feed marker
    _, metrics = jax.jit(alg.train_step)(state, batch,
                                         jax.random.PRNGKey(2))
    assert 0.0 <= float(metrics["online_reward"]) <= alg.rank_list_size

    offline = dev.gather(np.arange(8))  # no shown-list semantics
    _, metrics = jax.jit(alg.train_step)(state, offline,
                                         jax.random.PRNGKey(3))
    assert "online_reward" not in metrics
