"""Pallas kernel correctness tests (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_pytorch_tpu.models.dnn import DNN
from ultra_pytorch_tpu.ops.pallas.mlp import (
    fused_mlp_score, pallas_mlp_available)

pytestmark = pytest.mark.skipif(not pallas_mlp_available(),
                                reason="pallas unavailable")


@pytest.fixture(scope="module")
def dnn_and_params():
    dnn = DNN("hidden_layer_sizes=[32, 16]", 24)
    params = dnn.init(jax.random.PRNGKey(0), 24)
    return dnn, params


def test_fused_forward_matches_reference(dnn_and_params):
    dnn, params = dnn_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 9, 24))
    ref = dnn.apply(params, x)
    fused = fused_mlp_score(params["layers"], x, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_forward_unaligned_rows(dnn_and_params):
    dnn, params = dnn_and_params
    # 7 rows: far from the 256-row tile, exercises padding
    x = jax.random.normal(jax.random.PRNGKey(2), (7, 24))
    ref = dnn.apply(params, x[None])[0]
    fused = fused_mlp_score(params["layers"], x, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_gradients_match(dnn_and_params):
    dnn, params = dnn_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 5, 24))
    target = jax.random.normal(jax.random.PRNGKey(4), (4, 5))

    def loss_ref(params):
        return jnp.sum((dnn.apply(params, x) - target) ** 2)

    def loss_fused(params):
        s = fused_mlp_score(params["layers"], x, interpret=True)
        return jnp.sum((s - target) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_fused = jax.grad(loss_fused)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dnn_use_pallas_hparam():
    dnn = DNN("hidden_layer_sizes=[16],use_pallas=true", 12)
    params = dnn.init(jax.random.PRNGKey(5), 12)
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 4, 12))
    scores = dnn.apply(params, x)
    assert scores.shape == (3, 4)
    ref = DNN("hidden_layer_sizes=[16]", 12).apply(params, x)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_softmax_loss_matches_reference():
    from ultra_pytorch_tpu.ops import losses
    from ultra_pytorch_tpu.ops.pallas.listwise_loss import fused_softmax_loss

    rng = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(rng, 3)
    B, L = 6, 9
    s = jax.random.normal(k1, (B, L))
    y = (jax.random.uniform(k2, (B, L)) < 0.3).astype(jnp.float32)
    w = jax.random.uniform(k3, (B, L)) + 0.5
    m = jnp.ones((B, L)).at[:, 7:].set(0.0)

    ref = losses.softmax_loss(s, y, w, mask=m)
    fused = fused_softmax_loss(s, y, w, m, interpret=True)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)

    g_ref = jax.grad(lambda s: losses.softmax_loss(s, y, w, mask=m))(s)
    g_fused = jax.grad(
        lambda s: fused_softmax_loss(s, y, w, m, interpret=True))(s)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_fused_softmax_loss_no_weights_no_mask():
    from ultra_pytorch_tpu.ops import losses
    from ultra_pytorch_tpu.ops.pallas.listwise_loss import fused_softmax_loss

    s = jax.random.normal(jax.random.PRNGKey(0), (4, 5))
    y = jnp.asarray([[1, 0, 0, 1, 0]] * 4, jnp.float32)
    ref = losses.softmax_loss(s, y)
    fused = fused_softmax_loss(s, y, interpret=True)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)


def test_fused_loss_selectable_in_algorithm(toy_data_dir, tmp_path):
    """loss_func=fused_softmax_loss trains DLA end-to-end (wiring test;
    interpret mode on CPU)."""
    from ultra_pytorch_tpu.run.experiment import Experiment

    settings = {
        "train_input_feed": "ClickSimulationFeed",
        "train_input_hparams": "",
        "valid_input_feed": "DirectLabelFeed",
        "valid_input_hparams": "",
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[16]",
        "learning_algorithm": "DLA",
        "learning_algorithm_hparams": "loss_func=fused_softmax_loss",
        "metrics": ["ndcg"],
        "metrics_topn": [5],
        "objective_metric": "ndcg_5",
        "selection_bias_cutoff": 5,
    }
    exp = Experiment(settings, toy_data_dir, str(tmp_path / "m"),
                     batch_size=8, seed=0, dp="off")
    exp.setup(splits=("train", "valid"))
    exp.init_state()
    metrics = exp.train_steps(4)
    assert metrics["loss"] == metrics["loss"], "loss is NaN"


def test_use_pallas_click_hparam_falls_back_off_tpu(toy_data_dir):
    """use_pallas_click=true parses and produces valid clicks on CPU via
    the jnp fallback (the hardware-PRNG kernel needs a real TPU)."""
    import jax

    from ultra_pytorch_tpu.data.dataset import read_data
    from ultra_pytorch_tpu.input_layer.feeds import ClickSimulationFeed
    from ultra_pytorch_tpu.run.experiment import create_algorithm

    ds = read_data(toy_data_dir, "train")
    settings = {
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[8]",
        "learning_algorithm": "NaiveAlgorithm",
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg"], "metrics_topn": [5],
        "max_candidate_num": ds.rank_list_size,
        "selection_bias_cutoff": 5,
    }
    alg = create_algorithm(settings, ds.feature_size, ds.max_label)
    feed = ClickSimulationFeed(alg, 4, "use_pallas_click=true",
                               ds.to_device())
    state = alg.init_state(jax.random.PRNGKey(0), ds.feature_size)
    batch = feed.train_batch(jax.random.PRNGKey(1), state)
    labels = batch["labels"]
    assert labels.shape[0] == 4
    assert ((labels == 0) | (labels == 1)).all()


def test_fused_backward_accumulates_across_tiles(dnn_and_params):
    """>1 grid step (rows > TILE_N) exercises the bwd kernel's cross-tile
    parameter-gradient accumulation; also checks dx against XLA."""
    dnn, params = dnn_and_params
    x = jax.random.normal(jax.random.PRNGKey(7), (600, 24))  # 3 tiles
    g_out = jax.random.normal(jax.random.PRNGKey(8), (600,))

    def score_ref(params, x):
        return dnn.apply(params, x[None])[0]

    def score_fused(params, x):
        return fused_mlp_score(params["layers"], x, interpret=True)

    _, vjp_ref = jax.vjp(score_ref, params, x)
    _, vjp_fused = jax.vjp(score_fused, params, x)
    for a, b in zip(jax.tree_util.tree_leaves(vjp_ref(g_out)),
                    jax.tree_util.tree_leaves(vjp_fused(g_out))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
