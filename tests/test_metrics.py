"""Metric parity tests against reference-generated golden values
(tests/golden/reference_values.json, produced by
tools/gen_reference_goldens.py from the reference torch implementation)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from ultra_pytorch_tpu.metrics import ranking as m

GOLDEN = json.load(open(os.path.join(
    os.path.dirname(__file__), "golden", "reference_values.json")))

LABELS = jnp.asarray(GOLDEN["inputs"]["labels"], jnp.float32)
PREDS = jnp.asarray(GOLDEN["inputs"]["predictions"], jnp.float32)
TOPNS = GOLDEN["inputs"]["topns"]
MAX_LABEL = GOLDEN["inputs"]["max_label"]


@pytest.mark.parametrize("key", ["mrr", "err", "ndcg", "arp", "map"])
def test_metric_matches_reference(key):
    fn = m.make_ranking_metric_fn(key, TOPNS, max_label=MAX_LABEL)
    got = np.asarray(fn(LABELS, PREDS))
    want = np.asarray(GOLDEN["metrics"][key])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_opa_vs_reference_modulo_normalization():
    """Our OPA uses the TF-Ranking weighted mean; the reference divides by
    B*L*L (documented divergence). The two are related by the total pair
    weight."""
    got = float(m.ordered_pair_accuracy(LABELS, PREDS, topn=TOPNS)[0])
    ref = GOLDEN["metrics"]["ordered_pair_accuracy"][0]
    labels = np.asarray(LABELS)
    B, L = labels.shape
    valid = labels >= 0
    clean = np.where(valid, labels, 0.0)
    vpair = valid[:, :, None] & valid[:, None, :]
    ldiff = clean[:, :, None] - clean[:, None, :]
    pair_w = (ldiff > 0) * vpair
    expected = ref * (B * L * L) / pair_w.sum()
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_ndcg_perfect_ranking_is_one():
    labels = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    preds = jnp.asarray([[9.0, 8.0, 7.0, 6.0]])
    for n in (1, 2, 4):
        val = float(m.normalized_discounted_cumulative_gain(
            labels, preds, None, [n])[0])
        assert abs(val - 1.0) < 1e-6


def test_mrr_hand_computed():
    labels = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    preds = jnp.asarray([[3.0, 2.0, 1.0], [1.0, 2.0, 3.0]])
    # row 0: relevant doc ranked 2nd -> 1/2; row 1: relevant ranked 3rd -> 1/3
    val = float(m.mean_reciprocal_rank(labels, preds, topn=[3])[0])
    assert abs(val - (0.5 + 1.0 / 3.0) / 2.0) < 1e-6


def test_err_hand_computed():
    labels = jnp.asarray([[2.0, 0.0]])
    preds = jnp.asarray([[2.0, 1.0]])
    r1 = (2.0 ** 2 - 1) / (2.0 ** 2)  # 0.75
    want = r1  # first position: R1 * 1/1
    val = float(m.expected_reciprocal_rank(
        labels, preds, topn=[1], max_label=2.0)[0])
    assert abs(val - want) < 1e-6
    # at cutoff 2 add (1-R1) * R2 * 1/2 with R2 = 0
    val2 = float(m.expected_reciprocal_rank(
        labels, preds, topn=[2], max_label=2.0)[0])
    assert abs(val2 - want) < 1e-6


def test_padding_masked_out():
    labels = jnp.asarray([[1.0, 2.0, 0.0, 0.0]])
    preds = jnp.asarray([[0.1, 0.5, 9.0, 9.5]])  # pads score high
    mask = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    out = m.evaluate(labels, preds, ["ndcg"], [2], 2.0, mask=mask)
    # with pads pushed to PADDING_SCORE the ranking is doc2 > doc1 -> perfect
    assert abs(float(out["ndcg_2"]) - 1.0) < 1e-6


def test_precision_cutoff():
    labels = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    preds = jnp.asarray([[4.0, 3.0, 2.0, 1.0]])
    p2 = float(m.precision(labels, preds, topn=[2])[0])
    assert abs(p2 - 0.5) < 1e-6
    p4 = float(m.precision(labels, preds, topn=[4])[0])
    assert abs(p4 - 0.5) < 1e-6


def test_dcg_monotone_in_cutoff():
    labels = jnp.asarray([[2.0, 1.0, 1.0, 0.0]])
    preds = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    vals = m.discounted_cumulative_gain(labels, preds, topn=[1, 2, 4])
    assert float(vals[0]) <= float(vals[1]) <= float(vals[2])


def test_random_tie_break_quantified():
    """On a fully tied score list the deterministic argsort pins metrics to
    initial-list order, while rng tie-breaking recovers the expectation over
    random orders (ref metric_utils.py:49-85 shuffle_ties)."""
    import jax

    from ultra_pytorch_tpu.metrics.ranking import (
        normalized_discounted_cumulative_gain, random_tie_break)

    # one relevant doc at the LAST position; all predictions tied
    B, L = 512, 8
    labels = np.zeros((B, L), np.float32)
    labels[:, -1] = 1.0
    preds = np.zeros((B, L), np.float32)

    det = float(normalized_discounted_cumulative_gain(
        jnp.asarray(labels), jnp.asarray(preds), None, [L])[0])
    # deterministic stable sort keeps the relevant doc last -> worst NDCG
    assert abs(det - 1.0 / np.log2(1 + L)) < 1e-5

    shuffled = random_tie_break(jax.random.PRNGKey(0), jnp.asarray(preds))
    rnd = float(normalized_discounted_cumulative_gain(
        jnp.asarray(labels), shuffled, None, [L])[0])
    # expectation over uniform random position: mean of 1/log2(1+r)
    expect = np.mean([1.0 / np.log2(1 + r) for r in range(1, L + 1)])
    assert abs(rnd - expect) < 0.05
    # strict orderings survive the perturbation
    strict = np.tile(np.arange(L, 0, -1, dtype=np.float32), (B, 1))
    pert = np.asarray(random_tie_break(jax.random.PRNGKey(1),
                                       jnp.asarray(strict)))
    assert (np.argsort(-pert, axis=1) == np.argsort(-strict, axis=1)).all()
