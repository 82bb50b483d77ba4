"""Listwise / pairwise / pointwise ranking losses, mask-aware and jittable.

Capability parity with the shared loss library of the reference's
``BaseAlgorithm`` (ref ``ultra/learning_algorithm/base_algorithm.py:18-30``
and ``:228-333``). All functions take ``[B, L]`` scores/labels plus optional
``[B, L]`` propensity weights and a validity ``mask`` and reduce to a scalar.

Documented divergences from the reference (bugs not copied, see SURVEY.md §7):
  * ``pairwise_loss_on_list``: the reference double-counts its first pair,
    once without the propensity factor (ref ``:303-305``); here every pair
    contributes exactly once, with its propensity factor.
  * With a ``mask``, padded positions are excluded from softmax mass and from
    pair enumeration; the reference feeds zero PAD feature rows through the
    scorer instead (ref ``base_algorithm.py:147-154``).

The ``softmax_loss`` epsilon (labels + 1e-7) and its weighted-sum
normalization are preserved exactly (ref ``:324-330``) — they are part of the
algorithm's effective learning-rate schedule.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def softmax_cross_entropy_with_logits(logits: jax.Array,
                                      labels: jax.Array) -> jax.Array:
    """Per-list CE between a label distribution and softmax(logits)
    (ref ``base_algorithm.py:18-30``). Returns [B]."""
    return jnp.sum(-labels * jax.nn.log_softmax(logits, axis=-1), axis=-1)


def _ones_if_none(w, like):
    return jnp.ones_like(like) if w is None else w


def softmax_loss(output: jax.Array, labels: jax.Array,
                 propensity_weights: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None) -> jax.Array:
    """Propensity-weighted listwise softmax loss (ref ``:309-330``)."""
    propensity_weights = _ones_if_none(propensity_weights, labels)
    weighted_labels = (labels + 1e-7) * propensity_weights
    if mask is not None:
        weighted_labels = weighted_labels * mask
        output = jnp.where(mask > 0, output, NEG_INF)
    denom = jnp.sum(weighted_labels, axis=1, keepdims=True)
    label_dis = jnp.where(denom > 0, weighted_labels / jnp.where(
        denom > 0, denom, 1.0), 0.0)
    per_list = softmax_cross_entropy_with_logits(output, label_dis)
    per_list = per_list * jnp.squeeze(denom, 1)
    total = jnp.sum(weighted_labels)
    return jnp.sum(per_list) / jnp.where(total > 0, total, 1.0)


def sigmoid_loss_on_list(output: jax.Array, labels: jax.Array,
                         propensity_weights: Optional[jax.Array] = None,
                         mask: Optional[jax.Array] = None) -> jax.Array:
    """Pointwise BCE-with-logits, summed over the list and averaged over the
    batch (ref ``:250-270``; the same formula torch's BCEWithLogitsLoss
    computes for arbitrary real targets)."""
    propensity_weights = _ones_if_none(propensity_weights, labels)
    x, z = output, labels
    bce = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    loss = bce * propensity_weights
    if mask is not None:
        loss = loss * mask
    return jnp.mean(jnp.sum(loss, axis=1))


def pairwise_loss_on_list(output: jax.Array, labels: jax.Array,
                          propensity_weights: Optional[jax.Array] = None,
                          mask: Optional[jax.Array] = None) -> jax.Array:
    """Pairwise loss over all ordered pairs i<j (ref ``:272-307``):
    sign(l_i - l_j) * (-sigmoid(s_i - s_j)) * (pw_i*l_i + pw_j*l_j),
    summed and divided by batch size. Vectorized [B, L, L] instead of the
    reference's O(L^2) Python loop."""
    propensity_weights = _ones_if_none(propensity_weights, labels)
    s_i = output[:, :, None]
    s_j = output[:, None, :]
    l_i = labels[:, :, None]
    l_j = labels[:, None, :]
    w_i = propensity_weights[:, :, None]
    w_j = propensity_weights[:, None, :]

    label_weight = jnp.sign(l_i - l_j)
    pair_propensity = w_i * l_i + w_j * l_j
    pair_loss = -jax.nn.sigmoid(s_i - s_j)  # == -e^si / (e^si + e^sj)

    L = output.shape[1]
    upper = jnp.triu(jnp.ones((L, L), dtype=output.dtype), k=1)[None]
    valid = upper
    if mask is not None:
        valid = valid * mask[:, :, None] * mask[:, None, :]
    total = jnp.sum(label_weight * pair_loss * pair_propensity * valid)
    return total / output.shape[0]


def pairwise_cross_entropy_loss(pos_scores: jax.Array, neg_scores: jax.Array,
                                propensity_weights: Optional[jax.Array] = None
                                ) -> jax.Array:
    """Softmax CE on (pos, neg) score pairs labeled (1, 0)
    (ref ``:228-248``). Shapes [N, 1]; returns [N, 1]-shaped per-pair loss."""
    propensity_weights = _ones_if_none(propensity_weights, pos_scores)
    # -log softmax(pos over {pos, neg}) == log(1 + exp(neg - pos))
    loss = jnp.log1p(jnp.exp(-(pos_scores - neg_scores)))
    return loss * propensity_weights


def l2_loss(tree) -> jax.Array:
    """sum(x^2)/2 over a pytree of params (ref ``:332-333``)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(x ** 2) for x in leaves) / 2.0


def _fused_softmax_loss(output, labels, propensity_weights=None, mask=None):
    """softmax_loss via the fused Pallas kernel (ops/pallas/listwise_loss.py)
    — selectable with ``loss_func=fused_softmax_loss``; falls back to
    interpret mode off-TPU."""
    from ultra_pytorch_tpu.ops.pallas.listwise_loss import fused_softmax_loss
    return fused_softmax_loss(output, labels, propensity_weights, mask)


LOSS_FUNCTIONS = {
    "softmax_loss": softmax_loss,
    "sigmoid_loss": sigmoid_loss_on_list,
    "pairwise_loss": pairwise_loss_on_list,
    "fused_softmax_loss": _fused_softmax_loss,
}
