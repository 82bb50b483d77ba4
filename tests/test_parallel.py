"""Data-parallel training tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_pytorch_tpu.data import dataset as data_lib
from ultra_pytorch_tpu.input_layer.feeds import ClickSimulationFeed
from ultra_pytorch_tpu.parallel import (
    make_dp_train_step, make_mesh, shard_dataset)
from ultra_pytorch_tpu.run.experiment import create_algorithm


def _settings(algo, cutoff, click_model_json):
    return {
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[32, 16]",
        "learning_algorithm": algo,
        "learning_algorithm_hparams": "",
        "train_input_hparams": f"click_model_json={click_model_json}",
        "metrics": ["ndcg"],
        "metrics_topn": [5],
        "max_candidate_num": 10,
        "selection_bias_cutoff": 5,
    }


@pytest.fixture(scope="module")
def toy(toy_data_dir):
    ds = data_lib.read_data(toy_data_dir, "train")
    ds.pad(10)
    return ds


def test_devices_available():
    assert len(jax.devices()) == 8, (
        "conftest must provide 8 virtual CPU devices")


@pytest.mark.parametrize("algo", ["DLA", "RegressionEM", "PairDebias"])
def test_dp_train_step_runs_and_state_replicated(
        algo, toy, click_model_json, toy_data_dir):
    settings = _settings(algo, 5, click_model_json)
    alg = create_algorithm(settings, toy.feature_size, toy.max_label)
    mesh = make_mesh(8)
    dev = shard_dataset(toy.to_device(), mesh)
    feed = ClickSimulationFeed(
        alg, 16, settings["train_input_hparams"], dev)
    state = alg.init_state(jax.random.PRNGKey(0), toy.feature_size)
    step = make_dp_train_step(alg, feed, mesh)
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, sub, dev)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 3
    # params must be fully replicated (identical across shards)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_grad_sync_equivalence(toy, click_model_json):
    """A DP step on an 8-way mesh must equal the single-device step on the
    concatenation of the 8 per-shard batches (gradient pmean == mean over
    the full batch for mean-style losses)."""
    settings = _settings("NaiveAlgorithm", 5, click_model_json)
    settings["learning_algorithm_hparams"] = "loss_func=sigmoid_loss"
    alg = create_algorithm(settings, toy.feature_size, toy.max_label)
    mesh = make_mesh(8)
    dev = shard_dataset(toy.to_device(), mesh)
    feed = ClickSimulationFeed(
        alg, 16, settings["train_input_hparams"], dev)
    state0 = alg.init_state(jax.random.PRNGKey(0), toy.feature_size)

    rng = jax.random.PRNGKey(7)

    # Build the same 8 per-shard batches on one device and run one
    # equivalent fused step with mean-of-shard-grads semantics. RNG
    # convention (parallel/mesh.py): k_batch is folded per shard, k_train
    # is replica-identical.
    per_shard = 16 // 8
    k_batch, k_train = jax.random.split(rng)
    batches = []
    for idx in range(8):
        feed.batch_size = per_shard
        batches.append(
            (feed.train_batch(jax.random.fold_in(k_batch, idx), state0),
             k_train))
    feed.batch_size = 16

    def loss_of(params, batch):
        scores = alg.ranker.apply(params, batch["features"], batch["mask"])
        from ultra_pytorch_tpu.ops import losses
        return losses.sigmoid_loss_on_list(
            scores, batch["labels"], mask=batch["mask"])

    grads = None
    for batch, _ in batches:
        batch = alg.train_slice(batch)
        g = jax.grad(loss_of)(state0.params, batch)
        grads = g if grads is None else jax.tree_util.tree_map(
            jnp.add, grads, g)
    grads = jax.tree_util.tree_map(lambda g: g / 8.0, grads)
    params_ref, _ = alg.apply_updates(
        alg.optimizer(), state0.params, state0.opt_state, grads)
    params_ref = jax.tree_util.tree_map(np.asarray, params_ref)

    # DP step last: donate_argnums invalidates state0's buffers.
    dp_step = make_dp_train_step(alg, feed, mesh)
    state_dp, _ = dp_step(state0, rng, dev)

    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_batch_size_divisibility_check(toy, click_model_json):
    settings = _settings("NaiveAlgorithm", 5, click_model_json)
    alg = create_algorithm(settings, toy.feature_size, toy.max_label)
    mesh = make_mesh(8)
    dev = shard_dataset(toy.to_device(), mesh)
    feed = ClickSimulationFeed(alg, 12, settings["train_input_hparams"], dev)
    with pytest.raises(ValueError):
        make_dp_train_step(alg, feed, mesh)


def test_shard_queries_for_host(toy):
    from ultra_pytorch_tpu.parallel import shard_queries_for_host

    parts = [shard_queries_for_host(toy, host_id=h, num_hosts=3)
             for h in range(3)]
    assert sum(p.num_queries for p in parts) == toy.num_queries
    # each stripe's init_list must reference only its own compacted rows
    for p in parts:
        il = p.initial_list
        valid = il[il >= 0]
        assert valid.max() < p.features.shape[0]
        assert len(p.dids) == p.features.shape[0]
    # stripe features equal the rows the original referenced
    p0 = parts[0]
    orig_rows = np.unique(toy.initial_list[:p0.num_queries][
        toy.initial_list[:p0.num_queries] >= 0])
    np.testing.assert_allclose(p0.features, toy.features[orig_rows])


def _shards_identical(arr):
    """True iff every device's buffer of a 'replicated' array is equal."""
    shards = [np.asarray(s.data) for s in arr.addressable_shards]
    return all(np.array_equal(shards[0], s) for s in shards[1:])


@pytest.mark.parametrize("algo", ["MGD", "NSGD"])
def test_dp_bandit_family_replica_consistent(algo, toy, click_model_json):
    """The online/bandit family under shard_map: candidate noises are
    replica-identical, winner credit is pmean-synced, and NSGD's bad-noise
    memory must stay BITWISE identical on every replica (the silent-desync
    hazard — each shard runs its own interleaving + click simulation)."""
    from ultra_pytorch_tpu.input_layer.feeds import (
        StochasticOnlineSimulationFeed)

    settings = _settings(algo, 5, click_model_json)
    settings["learning_algorithm_hparams"] = (
        f"click_model_json={click_model_json},ranker_num=2")
    alg = create_algorithm(settings, toy.feature_size, toy.max_label)
    mesh = make_mesh(8)
    dev = shard_dataset(toy.to_device(), mesh)
    feed = StochasticOnlineSimulationFeed(
        alg, 16, settings["train_input_hparams"], dev)
    state = alg.init_state(jax.random.PRNGKey(0), toy.feature_size)
    step = make_dp_train_step(alg, feed, mesh)
    rng = jax.random.PRNGKey(3)
    for _ in range(2):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, sub, dev)
    assert np.isfinite(float(metrics["loss"]))
    # Bandit family logs the per-step online reward (mean clicks on the
    # multileaved SHOWN list) — bounded by the training cutoff.
    assert 0.0 <= float(metrics["online_reward"]) <= alg.rank_list_size
    for leaf in jax.tree_util.tree_leaves(state):
        assert _shards_identical(leaf), (
            f"{algo}: state leaf desynced across replicas")
    if algo == "NSGD":
        bad = state.aux["bad_noise"]
        # the memory should have recorded at least one losing direction
        total = sum(float(jnp.sum(jnp.abs(l)))
                    for l in jax.tree_util.tree_leaves(bad))
        assert total >= 0.0  # finite, replicated (checked above)


def test_dp_through_experiment_driver_path(toy_data_dir, click_model_json,
                                           tmp_path):
    """The PRODUCT path: Experiment(dp=8) must train on the 8-way mesh,
    handle a non-divisible tail window, checkpoint, and produce validation
    quality comparable to the single-device run (same protocol, different
    rng streams)."""
    from ultra_pytorch_tpu.run.experiment import Experiment

    settings = {
        "train_input_feed": "ClickSimulationFeed",
        "train_input_hparams": f"click_model_json={click_model_json}",
        "valid_input_feed": "DirectLabelFeed",
        "valid_input_hparams": "",
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[16]",
        "learning_algorithm": "DLA",
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg"],
        "metrics_topn": [5],
        "objective_metric": "ndcg_5",
        "selection_bias_cutoff": 5,
    }
    exp = Experiment(settings, toy_data_dir, str(tmp_path / "dp"),
                     batch_size=16, dp=8)
    exp.setup()
    assert exp.mesh is not None and exp.mesh.devices.size == 8
    exp.init_state()
    m1 = exp.train_steps(10)       # canonical window = 10
    m2 = exp.train_steps(13)       # 10 + 3-step single-step tail
    assert int(exp.state.step) == 23
    assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"])
    for leaf in jax.tree_util.tree_leaves(exp.state):
        assert _shards_identical(leaf)
    s_dp = exp.validate("valid")
    exp.save()

    exp1 = Experiment(dict(settings), toy_data_dir, str(tmp_path / "sd"),
                      batch_size=16, dp=0)
    exp1.setup()
    assert exp1.mesh is None
    exp1.init_state()
    exp1.train_steps(10)
    exp1.train_steps(13)
    s_1 = exp1.validate("valid")
    assert abs(s_dp["ndcg_5"] - s_1["ndcg_5"]) < 0.2


def test_device_sharded_dataset_shards_feature_table(toy):
    """device_sharded_dataset: each device holds ~1/N of the feature rows
    (its stripe's referenced rows + pad), not the full table."""
    from ultra_pytorch_tpu.parallel import device_sharded_dataset

    mesh = make_mesh(8)
    dev = device_sharded_dataset(toy, mesh)
    total_rows = toy.features.shape[0]
    assert dev.features.shape[0] == 8
    per_dev_rows = dev.features.shape[1]
    # stripe tables are the max over stripes of referenced rows (+1 PAD);
    # with 24 queries over 8 devices each stripe references ~3 queries'
    # docs — far below the full table
    assert per_dev_rows < total_rows * 0.6
    for shard in dev.features.addressable_shards:
        assert shard.data.shape == (1, per_dev_rows, toy.features.shape[1])


def test_shard_data_through_experiment_driver(toy_data_dir,
                                              click_model_json, tmp_path):
    """--shard_data trains through the driver on the 8-device mesh with a
    device-sharded feature table and sane validation quality."""
    from ultra_pytorch_tpu.run.experiment import Experiment

    settings = {
        "train_input_feed": "ClickSimulationFeed",
        "train_input_hparams": f"click_model_json={click_model_json}",
        "valid_input_feed": "DirectLabelFeed",
        "valid_input_hparams": "",
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[16]",
        "learning_algorithm": "DLA",
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg"],
        "metrics_topn": [5],
        "objective_metric": "ndcg_5",
        "selection_bias_cutoff": 5,
    }
    exp = Experiment(settings, toy_data_dir, str(tmp_path / "sh"),
                     batch_size=16, dp=8, shard_data=True)
    exp.setup()
    assert exp.mesh is not None
    # train split is device-stacked: leading per-device axis
    assert exp.device_data["train"].features.shape[0] == 8
    exp.init_state()
    m = exp.train_steps(10)
    assert np.isfinite(m["loss"])
    for leaf in jax.tree_util.tree_leaves(exp.state):
        assert _shards_identical(leaf)
    s = exp.validate("valid")
    assert s["ndcg_5"] > 0.4  # trained something sane on toy data


def test_shard_data_requires_mesh(toy_data_dir, click_model_json, tmp_path):
    from ultra_pytorch_tpu.run.experiment import Experiment

    settings = {
        "train_input_feed": "ClickSimulationFeed",
        "train_input_hparams": f"click_model_json={click_model_json}",
        "valid_input_feed": "DirectLabelFeed",
        "valid_input_hparams": "",
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[16]",
        "learning_algorithm": "DLA",
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg"],
        "metrics_topn": [5],
        "selection_bias_cutoff": 5,
    }
    exp = Experiment(settings, toy_data_dir, str(tmp_path / "e"),
                     batch_size=16, dp=0, shard_data=True)
    with pytest.raises(ValueError, match="shard_data"):
        exp.setup()
