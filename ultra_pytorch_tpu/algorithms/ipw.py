"""Inverse Propensity Weighting (IPW) rank.

Capability parity with ref ``ultra/learning_algorithm/ipw_rank.py`` (Wang et
al. SIGIR'16, Joachims et al. WSDM'17): a pre-trained propensity estimator
(loaded from the reference's JSON schema) converts the click pattern into
per-position IPW weights (ref ``:116-128``), which weight the selected
sigmoid / pairwise / softmax loss (ref ``:143-151``).

The reference computes weights per list in a Python loop on the host every
step; here ``estimator.weights(clicks)`` is a table lookup fused into the
jitted train step.
"""

from __future__ import annotations

import jax

from ultra_pytorch_tpu.algorithms.base import BaseAlgorithm, TrainState
from ultra_pytorch_tpu.sim.propensity import (
    BasicPropensityEstimator, OraclePropensityEstimator,
    RandomizedPropensityEstimator)
from ultra_pytorch_tpu.utils.registry import register

_ESTIMATORS = {
    "BasicPropensityEstimator": BasicPropensityEstimator,
    "RandomizedPropensityEstimator": RandomizedPropensityEstimator,
    "OraclePropensityEstimator": OraclePropensityEstimator,
}


@register("algorithm", "IPWrank",
          aliases=["ultra.learning_algorithm.IPWrank"])
class IPWrank(BaseAlgorithm):

    name = "ipw_rank"

    def default_hparams(self):
        # ref ipw_rank.py:48-58
        return {
            "propensity_estimator_type":
                "ultra.utils.propensity_estimator.RandomizedPropensityEstimator",
            "propensity_estimator_json":
                "./example/PropensityEstimator/randomized_pbm_0.1_1.0_4_1.0.json",
            "learning_rate": 0.05,
            "max_gradient_norm": 5.0,
            "loss_func": "softmax_loss",
            "l2_loss": 0.0,
            "grad_strategy": "ada",
        }

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        est_name = self.hparams.propensity_estimator_type.rsplit(".", 1)[-1]
        est_cls = _ESTIMATORS.get(est_name, RandomizedPropensityEstimator)
        self.propensity_estimator = est_cls(
            file_name=self.hparams.propensity_estimator_json)

    def train_step(self, state: TrainState, batch, rng):
        batch = self.train_slice(batch)
        clicks = batch["labels"]
        pw = self.propensity_estimator.weights(clicks)

        k_drop = self.dropout_rng(rng)

        def loss_of(params):
            scores = self.score_with_params(params, batch, rng=k_drop)
            loss = self.loss_fn(scores, clicks, pw, mask=batch.get("mask"))
            return loss + self.l2_penalty(params)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        params, opt_state = self.apply_updates(
            self.optimizer(), state.params, state.opt_state, grads)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), {"loss": loss}
