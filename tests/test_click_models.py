"""Click model statistical + structural tests.

The reference has no unit tests here (SURVEY.md §4); these pin the click
probabilities and the sequential-dependence structure against the
closed-form values from the reference's tables."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_pytorch_tpu.sim import click_models as cm

N = 30_000


def _click_rate(model, labels, n=N, seed=0):
    B = n
    L = len(labels)
    lab = jnp.tile(jnp.asarray(labels, jnp.float32), (B, 1))
    clicks, _, _ = cm.sample_clicks(model, jax.random.PRNGKey(seed), lab)
    return np.asarray(clicks.mean(axis=0))


def test_click_prob_table():
    model = cm.make_click_model("pbm", 0.1, 1.0, 4, 1.0)
    want = [0.1, 0.16, 0.28, 0.52, 1.0]  # a + 2^i b (ref :45-51)
    np.testing.assert_allclose(np.asarray(model.click_prob), want, atol=1e-6)


def test_pbm_click_rates_match_exam_times_clickprob():
    model = cm.make_click_model("pbm", 0.1, 1.0, 4, 1.0)
    labels = [4, 0, 2, 4]
    rates = _click_rate(model, labels)
    exam = np.asarray(cm.PBM_EXAM_PROB[:4])
    click_p = np.asarray([1.0, 0.1, 0.28, 1.0])
    np.testing.assert_allclose(rates, exam * click_p, atol=0.02)


def test_pbm_eta_sharpens_bias():
    flat = cm.make_click_model("pbm", 0.1, 1.0, 4, eta=0.0)
    steep = cm.make_click_model("pbm", 0.1, 1.0, 4, eta=2.0)
    labels = [4] * 10
    r_flat = _click_rate(flat, labels)
    r_steep = _click_rate(steep, labels)
    # eta=0: exam=1 everywhere -> uniform click rate 1.0 for label 4
    np.testing.assert_allclose(r_flat, 1.0, atol=0.01)
    # eta=2: last position exam 0.06^2
    assert r_steep[-1] < 0.01


def test_cascade_stops_after_first_click():
    model = cm.make_click_model("cascade", 0.1, 1.0, 4, 1.0)
    lab = jnp.tile(jnp.asarray([4.0, 4.0, 4.0, 4.0]), (5000, 1))
    clicks, _, _ = cm.sample_clicks(model, jax.random.PRNGKey(1), lab)
    assert float(clicks.sum(axis=1).max()) <= 1.0
    # label 4 -> click prob 1, exam 1 -> always click position 0
    np.testing.assert_allclose(np.asarray(clicks[:, 0]).mean(), 1.0)


def test_ubm_depends_on_last_click():
    model = cm.make_click_model("ubm", 0.0, 1.0, 1, 1.0)
    # click_prob = [0, 1]: clicks iff examined and label 1
    lab = jnp.tile(jnp.asarray([1.0, 1.0, 1.0]), (N, 1))
    clicks, _, _ = cm.sample_clicks(model, jax.random.PRNGKey(2), lab)
    rates = np.asarray(clicks.mean(axis=0))
    # rank 0, distance 1: table[0][0] = 1.0
    np.testing.assert_allclose(rates[0], 1.0, atol=1e-6)
    # rank 1 after click at 0 -> distance 1: table[1][0] = 0.98
    np.testing.assert_allclose(rates[1], 0.98, atol=0.01)


def test_pbm_propensity_weights():
    model = cm.make_click_model("pbm", 0.1, 1.0, 4, 1.0)
    clicks = jnp.asarray([[1.0, 0.0, 1.0]])
    pw = np.asarray(cm.propensity_weights(model, clicks))
    exam = np.asarray(cm.PBM_EXAM_PROB)
    np.testing.assert_allclose(
        pw[0], [1.0, 0.0, exam[0] / exam[2]], rtol=1e-5)
    pw_all = np.asarray(cm.propensity_weights(
        model, clicks, use_non_clicked_data=True))
    np.testing.assert_allclose(
        pw_all[0], exam[0] / exam[:3], rtol=1e-5)


def test_json_roundtrip(tmp_path):
    import json

    model = cm.make_click_model("ubm", 0.2, 0.8, 3, 1.5)
    desc = cm.model_to_json(model)
    model2 = cm.load_model_from_json(json.loads(json.dumps(desc)))
    assert model2.model_name == "user_browsing_model"
    np.testing.assert_allclose(np.asarray(model.click_prob),
                               np.asarray(model2.click_prob), rtol=1e-6)


def test_masked_positions_never_click():
    model = cm.make_click_model("pbm", 0.5, 1.0, 1, 0.0)
    lab = jnp.ones((1000, 4))
    mask = jnp.tile(jnp.asarray([[1.0, 1.0, 0.0, 0.0]]), (1000, 1))
    clicks, _, _ = cm.sample_clicks(model, jax.random.PRNGKey(3), lab, mask)
    assert float(clicks[:, 2:].sum()) == 0.0


def test_ubm_scan_sampler_matches_sequential_numpy_oracle():
    """The jitted lax.scan UBM path vs an independent sequential numpy
    implementation of the reference's semantics (exam =
    table[rank, rank - last_click_rank - 1], last_click_rank init -1,
    ref click_models.py:138-185) — statistical agreement of per-position
    AND click-conditional rates on identical label distributions."""
    model = cm.make_click_model("ubm", 0.1, 1.0, 4, 1.0)
    table = np.asarray(model.exam_prob, np.float64)
    click_p = np.asarray(model.click_prob, np.float64)

    rng = np.random.default_rng(7)
    N, L = 40000, 10
    labels = rng.integers(0, 5, size=(N, L)).astype(np.float64)

    # sequential numpy oracle
    oracle = np.zeros((N, L), np.float32)
    for i in range(N):
        last = -1
        for r in range(L):
            p = table[r, r - last - 1] * click_p[int(labels[i, r])]
            if rng.random() < p:
                oracle[i, r] = 1.0
                last = r
    ours, _, _ = cm.sample_clicks(model, jax.random.PRNGKey(11),
                                  jnp.asarray(labels))
    ours = np.asarray(ours)

    # per-position click rates (binomial se ~ 0.0025 at N=40000)
    np.testing.assert_allclose(ours.mean(0), oracle.mean(0), atol=0.012)
    # sequential dependence: P(click@p | click@p-1) for a few positions
    for p in (1, 4, 8):
        o = oracle[oracle[:, p - 1] > 0][:, p].mean()
        u = ours[ours[:, p - 1] > 0][:, p].mean()
        assert abs(o - u) < 0.025, (p, o, u)
