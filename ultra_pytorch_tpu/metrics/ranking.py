"""Listwise ranking metrics (MRR, ERR, ARP, NDCG, DCG, Precision, MAP, OPA).

Behavioral parity with the reference's TF-Ranking port
(ref ``ultra/utils/metrics.py``), sharing its conventions:

  * ``topn`` is a LIST of cutoffs evaluated in one pass (cumsum + index,
    ref ``metrics.py:191-221``);
  * labels < 0 are "invalid": the label is zeroed and the prediction pushed
    below the per-list minimum so the item sorts last
    (ref ``_prepare_and_validate_params`` ``:224-265``);
  * ERR normalizes gains by ``2^max_label``
    (ref ``:300-336``; max_label comes from the dataset's settings.json);
  * MRR / ARP / MAP / OPA are computed over the full list and replicated
    across cutoffs, exactly as the reference does.

Documented divergences (reference bugs NOT copied — see SURVEY.md §7
"fidelity traps"):
  * DCG: the reference's public ``discounted_cumulative_gain`` calls its
    helper with swapped arguments (ref ``metrics.py:522-523``); here DCG is
    the mean per-list discounted gain at each cutoff.
  * OPA: the reference takes an unweighted mean over the full BxLxL pair
    tensor (ref ``:567``); here OPA = sum(correct * w) / sum(w) (the
    TF-Ranking definition).
  * Precision honors the cutoff; the reference ignores it (ref ``:375-405``).
  * Tie handling: the reference SHUFFLES tied scores before sorting
    (ref ``metric_utils.py:49-85``); here the default is a deterministic
    stable argsort (biased toward initial-list order on ties — e.g. an
    untrained ranker emitting identical scores). Pass ``rng`` to
    :func:`evaluate` (or use :func:`random_tie_break`) for the reference's
    randomized behavior.

Everything is pure jnp over ``[B, L]`` arrays and jit/vmap/shard_map safe.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

PADDING_SCORE = -100000.0


class RankingMetricKey:
    MRR = "mrr"
    ERR = "err"
    ARP = "arp"
    NDCG = "ndcg"
    DCG = "dcg"
    PRECISION = "precision"
    MAP = "map"
    ORDERED_PAIR_ACCURACY = "ordered_pair_accuracy"


def _safe_div(num, den):
    return jnp.where(den == 0, jnp.zeros_like(num), num / jnp.where(den == 0, 1.0, den))


def _prepare(labels, predictions, weights, topn):
    """Mirror of ``_prepare_and_validate_params`` (ref metrics.py:224-265)."""
    labels = labels.astype(jnp.float32)
    predictions = predictions.astype(jnp.float32)
    weights = jnp.ones_like(labels) if weights is None else (
        jnp.ones_like(labels) * weights)
    list_size = predictions.shape[1]
    topn = [min(int(n), list_size) for n in (topn or [list_size])]
    valid = labels >= 0.0
    labels = jnp.where(valid, labels, 0.0)
    predictions = jnp.where(
        valid, predictions,
        -1e-6 + jnp.min(predictions, axis=1, keepdims=True))
    return labels, predictions, weights, topn


def _sort_by(predictions, *arrays):
    order = jnp.argsort(-predictions, axis=1, stable=True)
    return tuple(jnp.take_along_axis(a, order, axis=1) for a in arrays)


def _per_list_weights(weights, relevance):
    """Per-list weight from per-example weight (ref metrics.py:173-188)."""
    return _safe_div((weights * relevance).sum(1, keepdims=True),
                     relevance.sum(1, keepdims=True))


def _cutoff_cumsum(values, topn):
    """values [B, L] -> [B, len(topn)]: cumulative sums at each cutoff."""
    cum = jnp.cumsum(values, axis=1)
    idx = jnp.asarray([n - 1 for n in topn], dtype=jnp.int32)
    return cum[:, idx]


# -- individual metrics (each returns [len(topn)] means over the batch) ----

def mean_reciprocal_rank(labels, predictions, weights=None, topn=None):
    labels, predictions, weights, topn = _prepare(
        labels, predictions, weights, topn)
    list_size = predictions.shape[1]
    (sorted_labels,) = _sort_by(predictions, labels)
    relevance = (sorted_labels >= 1.0).astype(jnp.float32)
    rr = 1.0 / jnp.arange(1, list_size + 1, dtype=jnp.float32)
    mrr = jnp.max(relevance * rr, axis=1, keepdims=True)     # [B, 1]
    val = jnp.mean(mrr * jnp.ones_like(weights) * weights)
    return jnp.full((len(topn),), val)


def expected_reciprocal_rank(labels, predictions, weights=None, topn=None,
                             max_label=None):
    labels, predictions, weights, topn = _prepare(
        labels, predictions, weights, topn)
    sorted_labels, sorted_weights = _sort_by(predictions, labels, weights)
    list_size = sorted_labels.shape[1]
    relevance = (2.0 ** sorted_labels - 1.0) / (2.0 ** float(max_label))
    non_rel = jnp.cumprod(1.0 - relevance, axis=1) / (1.0 - relevance)
    rr = 1.0 / jnp.arange(1, list_size + 1, dtype=jnp.float32)
    contrib = relevance * non_rel * rr * sorted_weights       # [B, L]
    per_list = _cutoff_cumsum(contrib, topn)                  # [B, T]
    return jnp.mean(per_list, axis=0)


def average_relevance_position(labels, predictions, weights=None, topn=None):
    labels, predictions, weights, topn = _prepare(
        labels, predictions, weights, topn)
    list_size = predictions.shape[1]
    sorted_labels, sorted_weights = _sort_by(predictions, labels, weights)
    position = jnp.arange(1, list_size + 1, dtype=jnp.float32)
    weighted = sorted_labels * sorted_weights
    per_list = _safe_div((position * weighted).sum(1, keepdims=True),
                         weighted.sum(1, keepdims=True))
    return jnp.full((len(topn),), jnp.mean(per_list))


def _dcg_of_sorted(sorted_labels, sorted_weights, topn):
    list_size = sorted_labels.shape[1]
    discounts = 1.0 / jnp.log2(jnp.arange(list_size, dtype=jnp.float32) + 2.0)
    gains = sorted_weights * (2.0 ** sorted_labels - 1.0)
    return _cutoff_cumsum(gains * discounts, topn)            # [B, T]


def normalized_discounted_cumulative_gain(labels, predictions, weights=None,
                                          topn=None):
    has_weights = weights is not None
    labels, predictions, weights, topn = _prepare(
        labels, predictions, weights, topn)
    dcg = _dcg_of_sorted(*_sort_by(predictions, labels, weights), topn)
    ideal = _dcg_of_sorted(*_sort_by(labels, labels, weights), topn)
    per_list = _safe_div(dcg, ideal)                          # [B, T]
    if has_weights:
        plw = _per_list_weights(weights, 2.0 ** labels - 1.0)  # [B, 1]
        return jnp.mean(per_list * plw, axis=0)
    return jnp.mean(per_list, axis=0)


def discounted_cumulative_gain(labels, predictions, weights=None, topn=None):
    labels, predictions, weights, topn = _prepare(
        labels, predictions, weights, topn)
    dcg = _dcg_of_sorted(*_sort_by(predictions, labels, weights), topn)
    return jnp.mean(dcg, axis=0)


def precision(labels, predictions, weights=None, topn=None):
    labels, predictions, weights, topn = _prepare(
        labels, predictions, weights, topn)
    sorted_labels, sorted_weights = _sort_by(predictions, labels, weights)
    relevance = (sorted_labels >= 1.0).astype(jnp.float32)
    num = _cutoff_cumsum(relevance * sorted_weights, topn)
    den = _cutoff_cumsum(jnp.ones_like(relevance) * sorted_weights, topn)
    per_list = _safe_div(num, den)
    plw = _per_list_weights(weights, (labels >= 1.0).astype(jnp.float32))
    return jnp.mean(per_list * plw, axis=0)


def mean_average_precision(labels, predictions, weights=None, topn=None):
    labels, predictions, weights, topn = _prepare(
        labels, predictions, weights, topn)
    sorted_labels, sorted_weights = _sort_by(predictions, labels, weights)
    rel = (sorted_labels >= 1.0).astype(jnp.float32)
    rel_count = jnp.cumsum(rel, axis=1)
    cutoffs = jnp.cumsum(jnp.ones_like(rel), axis=1)
    prec = _safe_div(rel_count, cutoffs)
    total_prec = (prec * sorted_weights * rel).sum(1, keepdims=True)
    total_rel = (sorted_weights * rel).sum(1, keepdims=True)
    per_list = _safe_div(total_prec, total_rel)
    plw = _per_list_weights(weights, (labels >= 1.0).astype(jnp.float32))
    return jnp.full((len(topn),), jnp.mean(per_list * plw))


def ordered_pair_accuracy(labels, predictions, weights=None, topn=None):
    clean_labels, predictions, weights, topn = _prepare(
        labels, predictions, weights, topn)
    valid = clean_labels == labels.astype(jnp.float32)
    valid_pair = valid[:, :, None] & valid[:, None, :]
    label_diff = clean_labels[:, :, None] - clean_labels[:, None, :]
    pred_diff = predictions[:, :, None] - predictions[:, None, :]
    correct = ((label_diff > 0) & (pred_diff > 0)).astype(jnp.float32)
    pair_w = ((label_diff > 0).astype(jnp.float32)
              * weights[:, :, None] * valid_pair.astype(jnp.float32))
    val = _safe_div(jnp.sum(correct * pair_w), jnp.sum(pair_w))
    return jnp.full((len(topn),), val)


# -- factory + batch evaluation -------------------------------------------

def make_ranking_metric_fn(metric_key: str, topn: Sequence[int],
                           max_label: Optional[float] = None):
    """Factory mirroring ref ``metrics.py:62-153``. Returns
    fn(labels, predictions, weights) -> [len(topn)] array."""
    key = metric_key
    if key == RankingMetricKey.ERR:
        if max_label is None:
            raise ValueError("ERR requires max_label (dataset settings.json)")
        return functools.partial(
            expected_reciprocal_rank, topn=list(topn), max_label=max_label)
    table = {
        RankingMetricKey.MRR: mean_reciprocal_rank,
        RankingMetricKey.ARP: average_relevance_position,
        RankingMetricKey.NDCG: normalized_discounted_cumulative_gain,
        RankingMetricKey.DCG: discounted_cumulative_gain,
        RankingMetricKey.PRECISION: precision,
        RankingMetricKey.MAP: mean_average_precision,
        RankingMetricKey.ORDERED_PAIR_ACCURACY: ordered_pair_accuracy,
    }
    if key not in table:
        raise ValueError(f"metric_key {key!r} not supported")
    fn = table[key]
    return lambda labels, predictions, weights=None: fn(
        labels, predictions, weights=weights, topn=list(topn))


def mask_padding(scores: jax.Array, mask: jax.Array) -> jax.Array:
    """Push padded positions to PADDING_SCORE before metric computation
    (ref ``base_algorithm.py:88-116`` remove_padding_for_metric_eval)."""
    return jnp.where(mask > 0, scores, PADDING_SCORE)


def random_tie_break(rng: jax.Array, predictions: jax.Array) -> jax.Array:
    """Perturb `predictions` so that TIED scores sort in uniformly random
    order while every strict ordering is preserved.

    The reference shuffles tied scores before sorting (ref
    ``metric_utils.py:49-85`` sort_by_scores with shuffle_ties=True); a
    deterministic stable argsort instead biases metrics toward initial-list
    order when many scores tie (e.g. untrained rankers emitting zeros on
    click data). This jit-safe equivalent adds per-entry uniform noise
    strictly smaller than the smallest nonzero score gap in each list.
    """
    sorted_p = jnp.sort(predictions, axis=1)
    diffs = jnp.diff(sorted_p, axis=1)
    min_gap = jnp.min(jnp.where(diffs > 0, diffs, jnp.inf), axis=1,
                      keepdims=True)
    min_gap = jnp.where(jnp.isfinite(min_gap), min_gap, 1.0)
    u = jax.random.uniform(rng, predictions.shape, minval=0.0, maxval=0.5)
    return predictions + u * min_gap


def evaluate(labels: jax.Array, predictions: jax.Array,
             metric_keys: Sequence[str], topns: Sequence[int],
             max_label: float, mask: Optional[jax.Array] = None,
             weights: Optional[jax.Array] = None,
             rng: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """Compute `{metric}_{n}` for every metric x cutoff in one call.

    With `rng`, tied prediction scores are randomly ordered (the
    reference's shuffle_ties behavior); without it the sort is a
    deterministic stable argsort — a DOCUMENTED divergence that favors
    initial-list order on tied scores (see :func:`random_tie_break`).
    """
    if mask is not None:
        predictions = mask_padding(predictions, mask)
        labels = labels * mask
    if rng is not None:
        predictions = random_tie_break(rng, predictions)
    out: Dict[str, jax.Array] = {}
    for key in metric_keys:
        fn = make_ranking_metric_fn(key, list(topns), max_label=max_label)
        vals = fn(labels, predictions, weights)
        for n, v in zip(topns, vals):
            out[f"{key}_{n}"] = v
    return out


def ndcg(labels, predictions, topn: int = 10) -> jax.Array:
    """Convenience scalar NDCG@n (used for DBGD reward,
    ref ``metric_utils.py:244-274``)."""
    return normalized_discounted_cumulative_gain(
        labels, predictions, None, [topn])[0]
