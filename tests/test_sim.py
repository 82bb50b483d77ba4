"""Tests for Plackett-Luce sampling, team-draft interleaving, and
propensity estimators."""

import jax
import jax.numpy as jnp
import numpy as np

from ultra_pytorch_tpu.sim import click_models as cm
from ultra_pytorch_tpu.sim.interleave import (
    infer_winners, team_draft_interleave)
from ultra_pytorch_tpu.sim.propensity import (
    BasicPropensityEstimator, RandomizedPropensityEstimator)
from ultra_pytorch_tpu.sim.sampling import (
    deterministic_rank, plackett_luce_sample, rerank)


def test_pl_sample_is_permutation():
    rng = jax.random.PRNGKey(0)
    scores = jax.random.normal(rng, (64, 7))
    ranks = plackett_luce_sample(rng, scores, tau=1.0)
    sorted_ranks = np.sort(np.asarray(ranks), axis=1)
    np.testing.assert_array_equal(sorted_ranks,
                                  np.tile(np.arange(7), (64, 1)))


def test_pl_sample_first_position_distribution():
    # P(first = i) should be softmax(tau * scores)_i
    scores = jnp.asarray([[2.0, 1.0, 0.0]])
    scores = jnp.tile(scores, (40000, 1))
    ranks = plackett_luce_sample(jax.random.PRNGKey(1), scores, tau=1.0)
    first = np.asarray(ranks[:, 0])
    counts = np.bincount(first, minlength=3) / len(first)
    want = np.exp([2.0, 1.0, 0.0])
    want = want / want.sum()
    np.testing.assert_allclose(counts, want, atol=0.01)


def test_pl_high_tau_approaches_sort():
    scores = jnp.asarray([[0.5, 2.0, -1.0, 1.0]])
    ranks = plackett_luce_sample(jax.random.PRNGKey(2), scores, tau=100.0)
    np.testing.assert_array_equal(np.asarray(ranks[0]), [1, 3, 0, 2])


def test_pl_invalid_docs_go_last():
    scores = jnp.asarray([[5.0, 1.0, 9.0, 2.0]])
    mask = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    ranks = plackett_luce_sample(jax.random.PRNGKey(3), scores, mask,
                                 tau=100.0)
    assert set(np.asarray(ranks[0][:2]).tolist()) == {0, 2}
    np.testing.assert_array_equal(np.asarray(ranks[0][2:]), [1, 3])


def test_deterministic_rank():
    scores = jnp.asarray([[0.1, 0.9, 0.5]])
    np.testing.assert_array_equal(
        np.asarray(deterministic_rank(scores)[0]), [1, 2, 0])


def test_interleave_is_permutation_and_team_credit():
    rng = jax.random.PRNGKey(4)
    B, R, L = 32, 3, 8
    keys = jax.random.split(rng, B * R).reshape(B, R, 2)
    rankings = jnp.stack([
        jnp.stack([jax.random.permutation(jax.random.fold_in(rng, b * R + r),
                                          L) for r in range(R)])
        for b in range(B)])
    multileaved, teams = team_draft_interleave(rng, rankings)
    ml = np.asarray(multileaved)
    for b in range(B):
        assert sorted(ml[b].tolist()) == list(range(L))
    t = np.asarray(teams)
    assert t.min() >= -1 and t.max() < R


def test_interleave_common_prefix_gets_no_credit():
    # all rankers agree on position 0
    base = jnp.asarray([[0, 1, 2, 3], [0, 2, 1, 3]])
    rankings = jnp.tile(base[None], (4, 1, 1))
    _, teams = team_draft_interleave(jax.random.PRNGKey(5), rankings)
    np.testing.assert_array_equal(np.asarray(teams[:, 0]), -1)


def test_interleave_fair_first_pick():
    """Over many items, each of 2 rankers drafts first ~50% of the time."""
    r0 = jnp.asarray([0, 1, 2, 3])
    r1 = jnp.asarray([3, 2, 1, 0])
    rankings = jnp.tile(jnp.stack([r0, r1])[None], (4000, 1, 1))
    _, teams = team_draft_interleave(jax.random.PRNGKey(6), rankings)
    first_team = np.asarray(teams[:, 0])
    share = (first_team == 0).mean()
    assert 0.45 < share < 0.55


def test_infer_winners():
    teams = jnp.asarray([[0, 1, 0, -1]])
    clicks = jnp.asarray([[1.0, 1.0, 0.0, 1.0]])
    w = np.asarray(infer_winners(teams, clicks, 2))
    np.testing.assert_allclose(w[0], [0.5, 0.5], atol=1e-5)


def test_basic_estimator_weights():
    est = BasicPropensityEstimator(ipw_list=[1.0, 2.0, 4.0])
    clicks = jnp.asarray([[1.0, 0.0, 1.0, 1.0]])
    pw = np.asarray(est.weights(clicks))
    # position beyond table reuses last entry (ref :34-41)
    np.testing.assert_allclose(pw[0], [1.0, 0.0, 4.0, 4.0])


def test_randomized_estimator_recovers_pbm(tmp_path):
    model = cm.make_click_model("pbm", 0.1, 1.0, 4, 1.0)
    rng = np.random.default_rng(0)
    Q, L = 50, 6
    labels = rng.integers(0, 5, size=(Q, L)).astype(np.float32)
    mask = np.ones((Q, L), np.float32)
    est = RandomizedPropensityEstimator()
    est.estimate_from_model(model, labels, mask, sessions=400_000,
                            batch=1 << 15)
    exam = np.asarray(cm.PBM_EXAM_PROB[:L])
    want = exam[0] / exam
    np.testing.assert_allclose(np.asarray(est.IPW_list), want, rtol=0.1)
    # save/load roundtrip
    p = str(tmp_path / "est.json")
    est.save(p)
    est2 = BasicPropensityEstimator(file_name=p)
    np.testing.assert_allclose(est2.IPW_list, est.IPW_list)


def test_rerank():
    vals = jnp.asarray([[10.0, 20.0, 30.0]])
    ranking = jnp.asarray([[2, 0, 1]])
    np.testing.assert_array_equal(np.asarray(rerank(vals, ranking)[0]),
                                  [30.0, 10.0, 20.0])
