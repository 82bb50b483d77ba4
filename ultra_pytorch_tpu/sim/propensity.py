"""Propensity estimators.

Capability parity with ref ``ultra/utils/propensity_estimator.py``:

  * :class:`BasicPropensityEstimator` — a fixed per-position IPW table loaded
    from JSON (ref ``:10-66``), applied to click patterns.
  * :class:`RandomizedPropensityEstimator` — result-randomization estimation:
    simulate many sessions of label-shuffled lists through a click model and
    estimate ``IPW[x] = first_click / agg_click`` per position
    (ref ``estimateParametersFromModel`` ``:95-132``). The reference loops
    10M sessions one document at a time in Python; here sessions are
    simulated in large on-device batches (shuffle = uniform Plackett-Luce,
    clicks = vectorized click model, counts = scatter-add by list length).
  * :class:`OraclePropensityEstimator` — delegates to the click model's true
    examination probabilities (ref ``:149-167``).

All estimators expose ``weights(clicks[B, L]) -> [B, L]`` as a pure jittable
function so IPW weighting can live inside the fused train step.
"""

from __future__ import annotations

import json
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ultra_pytorch_tpu.sim import click_models as cm
from ultra_pytorch_tpu.sim.sampling import plackett_luce_sample, rerank


class BasicPropensityEstimator:
    """Per-position inverse propensity weights from a JSON table."""

    def __init__(self, file_name: Optional[str] = None,
                 ipw_list: Optional[np.ndarray] = None):
        if file_name:
            self.load(file_name)
        elif ipw_list is not None:
            self.IPW_list = list(np.asarray(ipw_list, dtype=np.float64))

    def load(self, file_name: str) -> None:
        with open(file_name) as fin:
            data = json.load(fin)
        self.IPW_list = data["IPW_list"]
        if "click_model" in data:
            self.click_model = cm.load_model_from_json(data["click_model"])

    def save(self, file_name: str) -> None:
        payload = {"IPW_list": list(map(float, self.IPW_list))}
        if getattr(self, "click_model", None) is not None:
            payload["click_model"] = cm.model_to_json(self.click_model)
        with open(file_name, "w") as fout:
            fout.write(json.dumps(payload, indent=4, sort_keys=True))

    def weights(self, clicks: jax.Array,
                use_non_clicked_data: bool = False) -> jax.Array:
        """[B, L] clicks -> [B, L] propensity weights; positions beyond the
        table reuse its last entry (ref ``propensity_estimator.py:34-41``)."""
        table = jnp.asarray(self.IPW_list, dtype=jnp.float32)
        L = clicks.shape[1]
        pos = jnp.minimum(jnp.arange(L), table.shape[0] - 1)
        pw = jnp.broadcast_to(table[pos], clicks.shape)
        if not use_non_clicked_data:
            pw = pw * (clicks > 0)
        return pw


class RandomizedPropensityEstimator(BasicPropensityEstimator):
    """Result-randomization propensity estimation, vectorized on device."""

    def estimate_from_model(self, click_model: cm.ClickModelParams,
                            labels: np.ndarray, mask: np.ndarray,
                            sessions: int = 10_000_000,
                            batch: int = 1 << 17,
                            seed: int = 0) -> None:
        """Run `sessions` randomized sessions over (labels, mask) [Q, L].

        Per session the reference shuffles one list and samples clicks
        (ref ``:107-118``); here each on-device batch draws `batch` random
        queries, shuffles each list uniformly (Plackett-Luce with flat
        scores), samples clicks, and scatter-adds click counts bucketed by
        list length.
        """
        self.click_model = click_model
        labels_d = jnp.asarray(labels, jnp.float32)
        mask_d = jnp.asarray(mask, jnp.float32)
        Q, L = labels.shape

        @jax.jit
        def run_batch(rng):
            k_q, k_shuf, k_click = jax.random.split(rng, 3)
            qs = jax.random.randint(k_q, (batch,), 0, Q)
            lb = labels_d[qs]
            mk = mask_d[qs]
            perm = plackett_luce_sample(
                k_shuf, jnp.zeros_like(lb), mk, tau=1.0)   # uniform shuffle
            lb_shuf = rerank(lb, perm)
            mk_shuf = rerank(mk, perm)
            clicks, _, _ = cm.sample_clicks(click_model, k_click, lb_shuf,
                                            mk_shuf)
            lengths = mk.sum(axis=1).astype(jnp.int32)      # [batch]
            counts = jnp.zeros((L, L), jnp.float32)
            return counts.at[lengths - 1].add(clicks)

        key = jax.random.PRNGKey(seed)
        counts = np.zeros((L, L), dtype=np.float64)
        done = 0
        while done < sessions:
            key, sub = jax.random.split(key)
            counts += np.asarray(run_batch(sub), dtype=np.float64)
            done += batch

        # first_click_count[x] = clicks at pos 0 over lists of length > x;
        # agg_click_count[x] = clicks at pos x over those lists
        # (ref :119-131, incl. the 10e-6 epsilon and the min() guard).
        first = np.array([counts[x:, 0].sum() for x in range(L)])
        agg = np.array([counts[x:, x].sum() for x in range(L)])
        self.IPW_list = [
            float(min(first[x] / (agg[x] + 10e-6), first[x]))
            for x in range(L)
        ]


class OraclePropensityEstimator(BasicPropensityEstimator):
    """True propensities straight from the click model."""

    def __init__(self, click_model: cm.ClickModelParams = None,
                 file_name: Optional[str] = None):
        self.click_model = click_model
        if file_name:
            self.load(file_name)

    def load(self, file_name: str) -> None:
        with open(file_name) as fin:
            data = json.load(fin)
        self.click_model = cm.load_model_from_json(data["click_model"])
        self.IPW_list = data.get("IPW_list")

    def weights(self, clicks: jax.Array,
                use_non_clicked_data: bool = False) -> jax.Array:
        return cm.propensity_weights(self.click_model, clicks,
                                     use_non_clicked_data)


def main(argv=None):
    """CLI mirror of ``python ultra/utils/propensity_estimator.py
    <click_model_json> <data_dir> <output_dir>`` (ref ``:183-200``):
    estimate a randomized propensity estimator from the train split."""
    import os
    import sys

    argv = argv if argv is not None else sys.argv[1:]
    click_model_json, data_dir, output_path = argv[:3]
    sessions = int(argv[3]) if len(argv) > 3 else 10_000_000

    import jax as _jax
    if os.environ.get("ULTRA_PLATFORM"):
        _jax.config.update("jax_platforms", os.environ["ULTRA_PLATFORM"])

    from ultra_pytorch_tpu.data.dataset import read_data

    train = read_data(data_dir, "train")
    click_model = cm.load_model_from_file(click_model_json)
    est = RandomizedPropensityEstimator()
    labels = train.labels
    mask = (train.initial_list >= 0).astype("float32")
    est.estimate_from_model(click_model, labels, mask, sessions=sessions)
    name = os.path.basename(click_model_json)[:-5]
    out = os.path.join(output_path, f"randomized_{name}.json")
    est.save(out)
    print(out)


if __name__ == "__main__":
    main()
