"""Vectorized on-device click models.

Capability parity with the reference's host-side, per-document Python click
models (ref ``ultra/utils/click_models.py``): PBM, UBM, and cascade, with the
ERR-inspired relevance->click-probability mapping
``P(click|rel=i) = a + 2^i * b`` (ref ``click_models.py:45-51``) and the same
hardcoded examination tables (ref ``:74-78`` PBM, ``:121-132`` UBM).

TPU-first design: a click model is a small pytree of arrays
(:class:`ClickModelParams`) plus pure functions

    sample_clicks(params, rng, labels[B,L])        -> clicks [B,L]
    propensity_weights(params, clicks[B,L])        -> weights [B,L]

PBM/cascade sample every position with one batched Bernoulli draw; the
sequential structures (UBM's distance-to-last-click, cascade's stop-after-
click) are ``lax.scan``/cumulative-mask computations, so click generation for
a whole batch is a single fused XLA program that never leaves the chip —
versus the reference's one-Python-call-per-document loop
(``click_models.py:80-87``).

``eta`` (bias severity) is carried as a traced scalar so the dynamic-bias
schedule (ref ``click_simulation_feed.py:166-172``) re-runs without
recompilation.
"""

from __future__ import annotations

import json
import sys
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Examination tables as published in the reference (behavioral constants of
# the simulation benchmark, ref click_models.py:76-77 and :121-131).
_PBM_EXAM_LIST = [0.68, 0.61, 0.48, 0.34, 0.28, 0.20, 0.11, 0.10, 0.08, 0.06]
PBM_EXAM_PROB = np.array(_PBM_EXAM_LIST, dtype=np.float32)

# UBM: row r gives exam prob at rank r indexed by (distance-to-last-click - 1);
# ragged rows padded on the right with their own last valid value.
_UBM_ROWS = [
    [1.0],
    [0.98, 1.0],
    [1.0, 0.62, 0.95],
    [1.0, 0.77, 0.42, 0.82],
    [1.0, 0.92, 0.55, 0.31, 0.69],
    [1.0, 0.96, 0.63, 0.4, 0.22, 0.54],
    [1.0, 0.99, 0.73, 0.46, 0.29, 0.17, 0.47],
    [1.0, 1.0, 0.89, 0.52, 0.35, 0.24, 0.14, 0.43],
    [1.0, 1.0, 0.95, 0.68, 0.4, 0.29, 0.19, 0.12, 0.41],
    [1.0, 1.0, 1.0, 0.96, 0.52, 0.36, 0.27, 0.18, 0.12, 0.43],
]


def _ubm_table() -> np.ndarray:
    t = np.zeros((10, 10), dtype=np.float32)
    for i, row in enumerate(_UBM_ROWS):
        t[i, : len(row)] = row
        t[i, len(row):] = row[-1]
    return t


UBM_EXAM_TABLE = _ubm_table()
UBM_ROW_LENGTHS = np.array([len(r) for r in _UBM_ROWS], dtype=np.int32)


@struct.dataclass
class ClickModelParams:
    """Pytree click-model parameters usable inside jitted programs."""

    click_prob: jax.Array           # [G+1] P(click | examined, rel=g)
    exam_prob: jax.Array            # PBM/cascade: [10]; UBM: [10, 10]
    eta: jax.Array                  # scalar bias severity
    model_name: str = struct.field(pytree_node=False,
                                   default="position_biased_model")

    @property
    def kind(self) -> str:
        return self.model_name


def make_click_model(name: str, neg_click_prob: float = 0.1,
                     pos_click_prob: float = 1.0,
                     relevance_grading_num: int = 4,
                     eta: float = 1.0) -> ClickModelParams:
    """Build a click model with the ERR-inspired click probabilities
    (ref ``click_models.py:45-51``)."""
    b = (pos_click_prob - neg_click_prob) / (2 ** relevance_grading_num - 1)
    a = neg_click_prob - b
    click_prob = np.array(
        [a + (2 ** i) * b for i in range(relevance_grading_num + 1)],
        dtype=np.float32)
    return _build(name, click_prob, eta)


def _build(name: str, click_prob: np.ndarray, eta: float,
           exam_prob: np.ndarray = None) -> ClickModelParams:
    canonical = {
        "pbm": "position_biased_model",
        "position_biased_model": "position_biased_model",
        "ubm": "user_browsing_model",
        "user_browsing_model": "user_browsing_model",
        "cascade": "cascade_model",
        "cascade_model": "cascade_model",
    }[name]
    if canonical == "user_browsing_model":
        base = UBM_EXAM_TABLE
    elif canonical == "cascade_model":
        base = np.ones(10, dtype=np.float32)
    else:
        base = PBM_EXAM_PROB
    return ClickModelParams(
        click_prob=jnp.asarray(click_prob, jnp.float32),
        exam_prob=jnp.asarray(base, jnp.float32),
        eta=jnp.asarray(eta, jnp.float32),
        model_name=canonical)


def load_model_from_json(desc: Dict[str, Any]) -> ClickModelParams:
    """Load from the reference's JSON schema
    ``{model_name, eta, click_prob, exam_prob}``
    (ref ``click_models.py:7-16,34-41``)."""
    return _build(desc["model_name"], np.asarray(desc["click_prob"]),
                  float(desc["eta"]))


def load_model_from_file(path: str) -> ClickModelParams:
    with open(path) as fin:
        return load_model_from_json(json.load(fin))


def model_to_json(params: ClickModelParams) -> Dict[str, Any]:
    exam = np.asarray(_exam_with_eta(params))
    if params.model_name == "user_browsing_model":
        exam_list = [exam[i, : int(UBM_ROW_LENGTHS[i])].tolist()
                     for i in range(10)]
    else:
        exam_list = exam.tolist()
    return {
        "model_name": params.model_name,
        "eta": float(params.eta),
        "click_prob": np.asarray(params.click_prob).tolist(),
        "exam_prob": exam_list,
    }


def _exam_with_eta(params: ClickModelParams) -> jax.Array:
    """Raise the base examination probabilities to the power eta
    (ref ``click_models.py:78`` / ``:135``)."""
    return params.exam_prob ** params.eta


def _click_prob_of_labels(params: ClickModelParams,
                          labels: jax.Array) -> jax.Array:
    """P(click | examined) per item: integer-clip labels, clamp the grade
    index into the click_prob table (ref ``click_models.py:102-105``)."""
    grades = jnp.clip(labels.astype(jnp.int32), 0,
                      params.click_prob.shape[0] - 1)
    return params.click_prob[grades]


def _pbm_exam_at_ranks(params: ClickModelParams, length: int) -> jax.Array:
    """Per-position examination probs, rank beyond table -> last entry
    (ref ``click_models.py:109-110``)."""
    exam = _exam_with_eta(params)
    ranks = jnp.minimum(jnp.arange(length), exam.shape[0] - 1)
    return exam[ranks]


def _ubm_exam(params: ClickModelParams, rank: jax.Array,
              last_click_rank: jax.Array) -> jax.Array:
    """UBM exam prob for (rank, last_click_rank) with the reference's
    edge-case handling for rank >= 10 (ref ``click_models.py:174-185``)."""
    table = _exam_with_eta(params)  # [10, 10]
    distance = rank - last_click_rank
    in_table = rank < table.shape[0]
    row_in = jnp.minimum(rank, table.shape[0] - 1)
    # rank < 10: exam_prob[rank][distance - 1]
    direct = table[row_in, jnp.clip(distance - 1, 0, table.shape[1] - 1)]
    # rank >= 10: row 9; distance > rank -> last col, else clipped to col 8
    last_row = table[-1]
    overflow_idx = jnp.where(distance - 1 < last_row.shape[0] - 1,
                             jnp.clip(distance - 1, 0, 8), 8)
    overflow = jnp.where(distance > rank, last_row[-1], last_row[overflow_idx])
    return jnp.where(in_table, direct, overflow)


def sample_clicks(params: ClickModelParams, rng: jax.Array,
                  labels: jax.Array, mask: jax.Array = None):
    """Sample clicks for a batch of lists. Returns (clicks, exam_p, click_p)
    each of shape [B, L], matching ``sampleClicksForOneList``'s outputs
    (ref ``click_models.py:80-87``). Pad positions (mask==0) never click."""
    B, L = labels.shape
    click_p = _click_prob_of_labels(params, labels)           # [B, L]
    u = jax.random.uniform(rng, (B, L))

    if params.model_name == "user_browsing_model":
        ranks = jnp.arange(L)

        def step(last_click, inputs):
            rank, cp, uu = inputs
            exam = _ubm_exam(params, rank, last_click)         # [B]
            click = (uu < exam * cp).astype(jnp.float32)
            last_click = jnp.where(click > 0, rank, last_click)
            return last_click, (click, exam)

        init = jnp.full((B,), -1, dtype=jnp.int32)
        _, (clicks_t, exam_t) = jax.lax.scan(
            step, init, (ranks, click_p.T, u.T))
        clicks, exam_p = clicks_t.T, exam_t.T
    else:
        exam_p = jnp.broadcast_to(_pbm_exam_at_ranks(params, L), (B, L))
        clicks = (u < exam_p * click_p).astype(jnp.float32)
        if params.model_name == "cascade_model":
            # Stop after the first click: positions after a click get 0
            # (ref click_models.py:198-212).
            prior = jnp.cumsum(clicks, axis=1) - clicks
            alive = (prior == 0).astype(jnp.float32)
            clicks = clicks * alive
            exam_p = exam_p * alive

    if mask is not None:
        clicks = clicks * mask
        exam_p = exam_p * mask
    return clicks, exam_p, click_p


def propensity_weights(params: ClickModelParams, clicks: jax.Array,
                       use_non_clicked_data: bool = False) -> jax.Array:
    """True propensity weights for a click pattern [B, L]
    (ref ``estimatePropensityWeightsForOneList``: PBM/cascade
    ``click_models.py:89-97``, UBM ``:151-162``)."""
    B, L = clicks.shape
    if params.model_name == "user_browsing_model":
        ranks = jnp.arange(L)

        def step(last_click, inputs):
            rank, ck = inputs
            exam = _ubm_exam(params, rank, last_click)
            pw = 1.0 / exam
            last_click = jnp.where(ck > 0, rank, last_click)
            return last_click, pw

        init = jnp.full((B,), -1, dtype=jnp.int32)
        _, pw_t = jax.lax.scan(step, init, (ranks, clicks.T))
        pw = pw_t.T
    else:
        exam = _pbm_exam_at_ranks(params, L)
        pw = jnp.broadcast_to(exam[0] / exam, (B, L))
    if not use_non_clicked_data:
        pw = pw * (clicks > 0)
    return pw


def click_model_json_numpy(name: str, neg: float, pos: float, grades: int,
                           eta: float) -> Dict[str, Any]:
    """Pure-numpy JSON construction (used by the CLI so tooling never
    initializes a jax backend)."""
    b = (pos - neg) / (2 ** grades - 1)
    a = neg - b
    click_prob = [a + (2 ** i) * b for i in range(grades + 1)]
    canonical = {"pbm": "position_biased_model", "ubm": "user_browsing_model",
                 "cascade": "cascade_model"}.get(name, name)
    if canonical == "user_browsing_model":
        exam = [[float(x ** eta) for x in row] for row in _UBM_ROWS]
    elif canonical == "cascade_model":
        exam = [1.0] * 10
    else:
        exam = [float(x ** eta) for x in _PBM_EXAM_LIST]
    return {"model_name": canonical, "eta": eta, "click_prob": click_prob,
            "exam_prob": exam}


def main(argv=None):
    """CLI mirror of ``python ultra/utils/click_models.py <model> <neg> <pos>
    <grades> <eta> <outdir>`` (ref ``click_models.py:279-302``)."""
    argv = argv if argv is not None else sys.argv[1:]
    name, neg, pos, grades, eta, outdir = argv[:6]
    desc = click_model_json_numpy(name, float(neg), float(pos), int(grades),
                                  float(eta))
    out = f"{outdir}/{'_'.join(argv[:5])}.json"
    with open(out, "w") as fout:
        json.dump(desc, fout, indent=4, sort_keys=True)
    print(out)


if __name__ == "__main__":
    main()
