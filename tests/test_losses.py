"""Loss parity tests vs reference goldens + analytic properties."""

import json
import os

import jax.numpy as jnp
import numpy as np

from ultra_pytorch_tpu.ops import losses

GOLDEN = json.load(open(os.path.join(
    os.path.dirname(__file__), "golden", "reference_values.json")))

PREDS = jnp.asarray(GOLDEN["inputs"]["predictions"], jnp.float32)
CLICKS = jnp.asarray(GOLDEN["inputs"]["clicks"], jnp.float32)
PW = jnp.asarray(GOLDEN["inputs"]["propensity_weights"], jnp.float32)


def test_softmax_cross_entropy_matches_reference():
    got = np.asarray(losses.softmax_cross_entropy_with_logits(PREDS, CLICKS))
    want = np.asarray(GOLDEN["losses"]["softmax_cross_entropy"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_softmax_loss_matches_reference():
    got = float(losses.softmax_loss(PREDS, CLICKS, PW))
    np.testing.assert_allclose(got, GOLDEN["losses"]["softmax_loss"],
                               rtol=1e-5)
    got_unw = float(losses.softmax_loss(PREDS, CLICKS))
    np.testing.assert_allclose(
        got_unw, GOLDEN["losses"]["softmax_loss_unweighted"], rtol=1e-5)


def test_sigmoid_loss_matches_reference():
    got = float(losses.sigmoid_loss_on_list(PREDS, CLICKS, PW))
    np.testing.assert_allclose(got, GOLDEN["losses"]["sigmoid_loss"],
                               rtol=1e-5)


def test_pairwise_loss_prefers_correct_order():
    labels = jnp.asarray([[1.0, 0.0]])
    good = losses.pairwise_loss_on_list(jnp.asarray([[2.0, 0.0]]), labels)
    bad = losses.pairwise_loss_on_list(jnp.asarray([[0.0, 2.0]]), labels)
    assert float(good) < float(bad)


def test_pairwise_cross_entropy_loss():
    pos = jnp.asarray([[2.0]])
    neg = jnp.asarray([[0.0]])
    got = float(losses.pairwise_cross_entropy_loss(pos, neg)[0, 0])
    want = float(np.log1p(np.exp(-2.0)))
    assert abs(got - want) < 1e-6


def test_l2_loss():
    tree = {"a": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([[2.0]])}
    assert abs(float(losses.l2_loss(tree)) - 4.5) < 1e-6


def test_masked_softmax_loss_ignores_pads():
    scores = jnp.asarray([[1.0, 2.0, 50.0]])
    clicks = jnp.asarray([[1.0, 0.0, 0.0]])
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    masked = float(losses.softmax_loss(scores, clicks, mask=mask))
    two_doc = float(losses.softmax_loss(scores[:, :2], clicks[:, :2]))
    np.testing.assert_allclose(masked, two_doc, rtol=1e-4)
