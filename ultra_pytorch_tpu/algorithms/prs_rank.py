"""PRS-rank: propensity-ratio-scored pairwise debiasing.

Capability parity with ref ``ultra/learning_algorithm/prs_rank.py``: a
LambdaRank-style ΔNDCG-weighted pairwise BCE, additionally weighted by a
propensity ratio score matrix ``prs = ipw_i ⊗ pw_j`` where ``ipw`` comes
from a pre-trained randomized estimator with ``use_non_clicked_data=True``
and ``pw = safe_div(1, ipw)`` (ref ``:108-151``), upper-triangular masked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.algorithms.base import BaseAlgorithm, TrainState
from ultra_pytorch_tpu.algorithms.lambda_rank import LambdaRank, _safe_div
from ultra_pytorch_tpu.sim.propensity import (
    BasicPropensityEstimator, OraclePropensityEstimator,
    RandomizedPropensityEstimator)
from ultra_pytorch_tpu.utils.registry import register

_ESTIMATORS = {
    "BasicPropensityEstimator": BasicPropensityEstimator,
    "RandomizedPropensityEstimator": RandomizedPropensityEstimator,
    "OraclePropensityEstimator": OraclePropensityEstimator,
}


@register("algorithm", "PRSrank",
          aliases=["ultra.learning_algorithm.PRSrank"])
class PRSrank(LambdaRank):

    name = "prs_rank"

    def default_hparams(self):
        # ref prs_rank.py:43-51
        return {
            "propensity_estimator_type":
                "ultra.utils.propensity_estimator.RandomizedPropensityEstimator",
            "propensity_estimator_json":
                "./example/PropensityEstimator/randomized_pbm_0.1_1.0_4_1.0.json",
            "learning_rate": 0.05,
            "max_gradient_norm": 5.0,
            "grad_strategy": "ada",
            "sigma": 1.0,
        }

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        est_name = self.hparams.propensity_estimator_type.rsplit(".", 1)[-1]
        est_cls = _ESTIMATORS.get(est_name, RandomizedPropensityEstimator)
        self.propensity_estimator = est_cls(
            file_name=self.hparams.propensity_estimator_json)

    def init_state(self, rng, feature_size):
        # No t+/t- state in PRS (debiasing comes from the prs matrix).
        return BaseAlgorithm.init_state(self, rng, feature_size)

    def train_step(self, state: TrainState, batch, rng):
        batch = self.train_slice(batch)
        clicks = batch["labels"]
        L = clicks.shape[1]
        ipw = self.propensity_estimator.weights(
            clicks, use_non_clicked_data=True)           # [B, L]
        pw = _safe_div(jnp.ones_like(ipw), ipw)
        triu = jnp.triu(jnp.ones((L, L)), k=1)[None]

        k_drop = self.dropout_rng(rng)

        def loss_of(params):
            scores = self.score_with_params(params, batch, rng=k_drop)
            order = jnp.argsort(-scores, axis=1, stable=True)
            p_ij, std_p_ij, delta = self._pair_matrices(scores, clicks)
            ipw_sorted = jnp.take_along_axis(ipw, order, axis=1)
            pw_sorted = jnp.take_along_axis(pw, order, axis=1)
            prs = ipw_sorted[:, :, None] * pw_sorted[:, None, :] * triu
            # plain BCE on probabilities (ref :147-149), weights = ΔNDCG,
            # upper-triangular; torch clamps log at -100. The double-where
            # keeps d(log)/dp finite where the triu mask zeroes the term
            # (0 * inf would poison the gradient).
            p = jnp.clip(p_ij * triu, 0.0, 1.0)
            z = std_p_ij * triu
            p_ok = p > 1e-12
            q_ok = (1.0 - p) > 1e-12
            log_p = jnp.maximum(jnp.where(
                p_ok, jnp.log(jnp.where(p_ok, p, 1.0)), -100.0), -100.0)
            log_1mp = jnp.maximum(jnp.where(
                q_ok, jnp.log(jnp.where(q_ok, 1.0 - p, 1.0)), -100.0),
                -100.0)
            bce = -(z * log_p + (1.0 - z) * log_1mp) * (delta * triu)
            return jnp.sum(bce * jax.lax.stop_gradient(prs))

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        params, opt_state = self.apply_updates(
            self.optimizer(), state.params, state.opt_state, grads)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), {"loss": loss}
