"""Checkpoint resume, ULTRE format, dynamic bias schedule, oracle mode."""

import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from ultra_pytorch_tpu.data import dataset as data_lib
from ultra_pytorch_tpu.input_layer.feeds import ClickSimulationFeed
from ultra_pytorch_tpu.run.experiment import Experiment, create_algorithm
from ultra_pytorch_tpu.utils import checkpoint as ckpt


def _settings(click_model_json):
    return {
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


def test_checkpoint_resume_bit_exact(toy_data_dir, click_model_json,
                                     tmp_path):
    """Save at step 3, train 3 more; vs restore + train 3 — identical."""
    s = _settings(click_model_json)

    exp = Experiment(s, toy_data_dir, str(tmp_path / "m"), batch_size=8)
    exp.setup()
    exp.init_state()
    exp.train_steps(3)
    exp.save()
    exp.train_steps(3)
    params_a = jax.tree_util.tree_leaves(exp.state.params)

    exp2 = Experiment(dict(s), toy_data_dir, str(tmp_path / "m"),
                      batch_size=8)
    exp2.setup()
    exp2.init_state()
    assert exp2.restore()
    assert int(exp2.state.step) == 3  # full state incl. step counter
    exp2.train_steps(3)
    params_b = jax.tree_util.tree_leaves(exp2.state.params)

    for a, b in zip(params_a, params_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_preserves_aux_state(toy_data_dir, click_model_json,
                                        tmp_path):
    s = _settings(click_model_json)
    s["learning_algorithm"] = "RegressionEM"
    exp = Experiment(s, toy_data_dir, str(tmp_path / "m2"), batch_size=8)
    exp.setup()
    exp.init_state()
    exp.train_steps(5)
    prop_before = np.asarray(exp.state.aux["propensity"])
    assert not np.allclose(prop_before, 0.9)  # EM moved it
    exp.save()
    exp2 = Experiment(dict(s), toy_data_dir, str(tmp_path / "m2"),
                      batch_size=8)
    exp2.setup()
    exp2.init_state()
    assert exp2.restore()
    np.testing.assert_array_equal(
        np.asarray(exp2.state.aux["propensity"]), prop_before)


def test_ultre_format_with_logged_clicks(toy_data_dir, tmp_path):
    """Build a tiny ULTRE dataset: doc-id-keyed features + click labels in a
    click-model subdirectory (ref data_utils.py:191-285)."""
    src = data_lib.read_data(toy_data_dir, "train")
    root = tmp_path / "ultre"
    sub = root / "train"
    os.makedirs(sub)
    json.dump({"feature_size": src.feature_size, "max_label": 1.0},
              open(root / "settings.json", "w"))
    # features keyed by did; init_list references dids
    with open(sub / "train.feature", "w") as f_feat, \
            open(sub / "train.init_list", "w") as f_init, \
            open(sub / "train.labels", "w") as f_lab:
        for q in range(6):
            dids = []
            for d in range(4):
                did = f"q{q}_d{d}"
                dids.append(did)
                vec = " ".join(
                    f"{i + 1}:{0.1 * (d + 1):.2f}" for i in range(0, 8, 2))
                f_feat.write(f"{did} {vec}\n")
            f_init.write(f"q{q} " + " ".join(dids) + "\n")
            f_lab.write(f"q{q} 1.0 0.0 1.0 0.0\n")
    # logged clicks live in a click-model dir
    cm_dir = tmp_path / "clicks"
    os.makedirs(cm_dir)
    with open(cm_dir / "train.labels", "w") as f:
        for q in range(6):
            f.write(f"q{q} 0.0 1.0 0.0 0.0\n")

    ds = data_lib.read_data(str(root), "train",
                            click_model_dir=str(cm_dir))
    assert ds.num_queries == 6
    # labels must come from the click-model dir
    np.testing.assert_array_equal(ds.labels[0], [0.0, 1.0, 0.0, 0.0])


def test_dynamic_bias_eta_schedule(toy_data_dir, click_model_json):
    ds = data_lib.read_data(toy_data_dir, "train")
    ds.pad(ds.rank_list_size)
    settings = {"max_candidate_num": ds.rank_list_size,
                "selection_bias_cutoff": 5,
                "ranking_model": "Linear", "ranking_model_hparams": "",
                "learning_algorithm": "NaiveAlgorithm",
                "learning_algorithm_hparams": "",
                "metrics": ["ndcg"], "metrics_topn": [5]}
    alg = create_algorithm(settings, ds.feature_size, ds.max_label)
    feed = ClickSimulationFeed(
        alg, 8,
        f"click_model_json={click_model_json},"
        "dynamic_bias_eta_change=0.5,dynamic_bias_step_interval=10",
        ds.to_device())
    state0 = alg.init_state(jax.random.PRNGKey(0), ds.feature_size)
    eta0 = float(feed._eta_at_step(jnp.asarray(0)))
    eta25 = float(feed._eta_at_step(jnp.asarray(25)))
    assert abs(eta0 - 1.0) < 1e-6
    assert abs(eta25 - 2.0) < 1e-6  # 1.0 + floor(25/10)*0.5


def test_oracle_mode_feeds_relevance(toy_data_dir, click_model_json):
    ds = data_lib.read_data(toy_data_dir, "train")
    ds.pad(ds.rank_list_size)
    settings = {"max_candidate_num": ds.rank_list_size,
                "selection_bias_cutoff": 5,
                "ranking_model": "Linear", "ranking_model_hparams": "",
                "learning_algorithm": "NaiveAlgorithm",
                "learning_algorithm_hparams": "",
                "metrics": ["ndcg"], "metrics_topn": [5]}
    alg = create_algorithm(settings, ds.feature_size, ds.max_label)
    dev = ds.to_device()
    feed = ClickSimulationFeed(alg, 8, "oracle_mode=true", dev)
    state = alg.init_state(jax.random.PRNGKey(0), ds.feature_size)
    batch = feed.train_batch(jax.random.PRNGKey(1), state)
    labels = np.asarray(batch["labels"])
    assert labels.max() > 1.0  # graded relevance, not binary clicks


def test_online_feeds_accept_dynamic_bias_hparams(toy_data_dir,
                                                  click_model_json):
    """A reference-style ONLINE config with dynamic bias must parse and
    schedule eta (ref deterministic_online_simulation_feed.py:48-52,230-234;
    stochastic_online_simulation_feed.py:49-52 declare these hparams)."""
    from ultra_pytorch_tpu.input_layer.feeds import (
        DeterministicOnlineSimulationFeed, StochasticOnlineSimulationFeed)

    ds = data_lib.read_data(toy_data_dir, "train")
    ds.pad(ds.rank_list_size)
    settings = {"max_candidate_num": ds.rank_list_size,
                "selection_bias_cutoff": 5,
                "ranking_model": "Linear", "ranking_model_hparams": "",
                "learning_algorithm": "NaiveAlgorithm",
                "learning_algorithm_hparams": "",
                "metrics": ["ndcg"], "metrics_topn": [5]}
    alg = create_algorithm(settings, ds.feature_size, ds.max_label)
    dev = ds.to_device()
    state = alg.init_state(jax.random.PRNGKey(0), ds.feature_size)
    hp = (f"click_model_json={click_model_json},"
          "dynamic_bias_eta_change=0.3,dynamic_bias_step_interval=20")
    for cls in (DeterministicOnlineSimulationFeed,
                StochasticOnlineSimulationFeed):
        feed = cls(alg, 8, hp, dev)
        assert abs(float(feed._eta_at_step(jnp.asarray(0))) - 1.0) < 1e-6
        assert abs(float(feed._eta_at_step(jnp.asarray(45))) - 1.6) < 1e-6
        batch = feed.train_batch(jax.random.PRNGKey(2), state)
        assert np.isfinite(np.asarray(batch["labels"]).sum())


def test_restore_with_mismatched_prng_is_clear_error(toy_data_dir, tmp_path):
    """A checkpoint written under threefry must refuse to restore under
    --prng rbg with a message naming the flag (key shapes differ)."""
    import jax
    import pytest

    from ultra_pytorch_tpu.run.experiment import Experiment

    settings = {
        "train_input_feed": "DirectLabelFeed",
        "train_input_hparams": "",
        "valid_input_feed": "DirectLabelFeed",
        "valid_input_hparams": "",
        "ranking_model": "Linear",
        "ranking_model_hparams": "",
        "learning_algorithm": "NaiveAlgorithm",
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg"], "metrics_topn": [5],
        "objective_metric": "ndcg_5",
        "selection_bias_cutoff": 5,
    }
    exp = Experiment(settings, toy_data_dir, str(tmp_path / "m"),
                     batch_size=8, dp=0)
    exp.setup(splits=("train",))
    exp.init_state()
    exp.save()

    try:
        jax.config.update("jax_default_prng_impl", "rbg")
        exp2 = Experiment(settings, toy_data_dir, str(tmp_path / "m"),
                          batch_size=8, dp=0)
        exp2.setup(splits=("train",))
        exp2.init_state()
        with pytest.raises(ValueError, match="--prng"):
            exp2.restore()
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")


def test_compact_resampling_matches_rounds_distribution(toy_data_dir,
                                                        click_model_json):
    """resample_strategy=compact (overdrawn pool + stable compaction) must
    produce the same rejection distribution as the per-slot rounds
    strategy: every kept slot clicked, and the per-query frequency of the
    two strategies agrees within sampling noise."""
    ds = data_lib.read_data(toy_data_dir, "train", None)
    ds.pad(ds.rank_list_size)
    dev = ds.to_device()
    s = _settings(click_model_json)
    s["max_candidate_num"] = ds.rank_list_size
    alg = create_algorithm(s, ds.feature_size, ds.max_label)
    state = alg.init_state(jax.random.PRNGKey(0), ds.feature_size)

    valid_frac = {}
    click_depth = {}
    for strategy in ("compact", "rounds"):
        feed = ClickSimulationFeed(
            alg, 64,
            f"click_model_json={click_model_json},"
            f"resample_strategy={strategy}", dev)
        n_valid = n_total = 0
        depth_sum = depth_n = 0.0
        for i in range(40):
            b = feed.train_batch(jax.random.PRNGKey(1000 + i), state, dev)
            valid = np.asarray(b["mask"]).max(axis=1) > 0
            # every kept (non-masked) slot must actually contain a click
            clicks = np.asarray(b["labels"])
            clicked = clicks.sum(axis=1) > 0
            assert (clicked >= valid).all()
            n_valid += int(valid.sum())
            n_total += valid.size
            # mean clicked position over kept slots — a distribution
            # fingerprint that would move if compaction biased the samples
            pos = np.argmax(clicks[valid], axis=1)
            depth_sum += pos.sum()
            depth_n += len(pos)
        valid_frac[strategy] = n_valid / n_total
        click_depth[strategy] = depth_sum / depth_n
    # Both strategies fill nearly every slot at this click rate (the toy
    # per-draw click probability is ~0.4: rounds fills 1-(1-p)^9 ~= 0.99,
    # compact Binom(4B, p) >= B with prob ~1).
    assert valid_frac["compact"] > 0.97
    assert valid_frac["rounds"] > 0.97
    # Same first-click-depth distribution within sampling noise.
    assert abs(click_depth["compact"] - click_depth["rounds"]) < 0.15


def test_compact_resampling_masks_unfilled_slots(toy_data_dir, tmp_path):
    """With a click model that almost never clicks, compact must mask the
    slots it could not fill instead of feeding clickless lists."""
    from ultra_pytorch_tpu.sim.click_models import click_model_json_numpy
    cm = click_model_json_numpy("pbm", 0.0, 0.001, 4, 1.0)
    p = tmp_path / "rare.json"
    p.write_text(json.dumps(cm))
    ds = data_lib.read_data(toy_data_dir, "train", None)
    ds.pad(ds.rank_list_size)
    dev = ds.to_device()
    s = _settings(str(p))
    s["train_input_hparams"] = f"click_model_json={p}"
    s["max_candidate_num"] = ds.rank_list_size
    alg = create_algorithm(s, ds.feature_size, ds.max_label)
    state = alg.init_state(jax.random.PRNGKey(0), ds.feature_size)
    feed = ClickSimulationFeed(
        alg, 32, f"click_model_json={p},resample_strategy=compact", dev)
    b = feed.train_batch(jax.random.PRNGKey(3), state, dev)
    valid = np.asarray(b["mask"]).max(axis=1) > 0
    clicked = np.asarray(b["labels"]).sum(axis=1) > 0
    # unclicked slots are exactly the masked ones
    np.testing.assert_array_equal(valid, clicked)
    assert (~valid).sum() > 0  # the rare-click model really left gaps


def test_restore_with_old_state_format_is_clear_error(toy_data_dir,
                                                      click_model_json,
                                                      tmp_path):
    """A checkpoint recorded under a different TrainState layout (e.g. the
    r3 per-leaf optimizer state) must fail with a clear message, not a
    deep template mismatch."""
    import pytest

    from ultra_pytorch_tpu.run import experiment as exp_mod

    s = _settings(click_model_json)
    exp = Experiment(s, toy_data_dir, str(tmp_path / "m"), batch_size=8)
    exp.setup()
    exp.init_state()
    exp.save(extra={"state_format": "opt-per-leaf-r3"})

    exp2 = Experiment(dict(s), toy_data_dir, str(tmp_path / "m"),
                      batch_size=8)
    exp2.setup()
    exp2.init_state()
    with pytest.raises(ValueError, match="state layout"):
        exp2.restore()
    assert exp_mod.STATE_FORMAT == "opt-flat-r4"


def test_restore_params_only_migrates_old_layouts(toy_data_dir,
                                                  click_model_json,
                                                  tmp_path):
    """--restore_params_only carries the ranker weights out of a
    checkpoint regardless of its optimizer-state layout version (the
    ADVICE-r4 migration path): params restore exactly, optimizer/aux
    state start fresh, and training continues."""
    s = _settings(click_model_json)
    exp = Experiment(s, toy_data_dir, str(tmp_path / "m"), batch_size=8)
    exp.setup()
    exp.init_state()
    exp.train_steps(3)
    trained = [np.asarray(x)
               for x in jax.tree_util.tree_leaves(exp.state.params)]
    # Stamp an old layout version: params leaves precede opt_state in the
    # flatten order, so the prefix loader must not care about the stamp.
    exp.save(extra={"state_format": "opt-per-leaf-r3"})

    exp2 = Experiment(dict(s), toy_data_dir, str(tmp_path / "m"),
                      batch_size=8)
    exp2.setup()
    exp2.init_state()
    assert exp2.restore(params_only=True)
    for a, b in zip(trained,
                    jax.tree_util.tree_leaves(exp2.state.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert int(exp2.state.step) == 0          # fresh optimizer/step
    m = exp2.train_steps(2)                   # training continues
    assert np.isfinite(m["loss"])
