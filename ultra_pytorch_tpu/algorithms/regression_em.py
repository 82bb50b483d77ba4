"""Regression-based EM (online EM) for unbiased learning to rank.

Capability parity with ref ``ultra/learning_algorithm/regression_EM.py``
(Wang et al. WSDM'18; online EM per Cappé & Moulines 2009):

  * E-step (ref ``:132-147``): ``gamma = sigmoid(scores)``; posterior
    relevance ``p_r1 = c + (1-c) * (1-prop)*gamma / (1-prop*gamma)``;
    Bernoulli pseudo-labels sampled as ``ceil(p - U)`` and trained with BCE
    (ref ``get_bernoulli_sample`` ``:20-34``, loss ``:151-153``);
  * M-step (ref ``:184-187``): EMA propensity update with ``EM_step_size``
    toward ``mean(c + (1-c) * prop*(1-gamma)/(1-prop*gamma))``.

The propensity vector lives in ``TrainState.aux`` (the reference keeps it as
a mutable attribute that is lost on checkpoint). Under data parallelism the
M-step batch mean goes through ``self.sync`` so replicas agree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.algorithms.base import BaseAlgorithm, TrainState
from ultra_pytorch_tpu.utils.registry import register


@register("algorithm", "RegressionEM",
          aliases=["ultra.learning_algorithm.RegressionEM"])
class RegressionEM(BaseAlgorithm):

    name = "regression_em"

    def default_hparams(self):
        # ref regression_EM.py:60-67
        return {
            "EM_step_size": 0.05,
            "learning_rate": 0.05,
            "max_gradient_norm": 5.0,
            "l2_loss": 0.0,
            "grad_strategy": "ada",
        }

    def init_state(self, rng, feature_size):
        state = super().init_state(rng, feature_size)
        # propensity init 0.9 per position (ref :93-96)
        propensity = jnp.full((1, self.rank_list_size), 0.9)
        return state.replace(aux={"propensity": propensity})

    def train_step(self, state: TrainState, batch, rng):
        batch = self.train_slice(batch)
        clicks = batch["labels"]
        mask = batch.get("mask")
        propensity = state.aux["propensity"]

        # E-step quantities use the CURRENT scores without gradient.
        scores0 = self.score_with_params(state.params, batch)
        gamma = jax.nn.sigmoid(scores0)
        denom = 1.0 - propensity * gamma
        p_e1_r0_c0 = propensity * (1.0 - gamma) / denom
        p_e0_r1_c0 = (1.0 - propensity) * gamma / denom
        p_r1 = clicks + (1.0 - clicks) * p_e0_r1_c0

        # Bernoulli pseudo-labels: ceil(p - U) (ref :20-34). Per-example
        # randomness -> per-shard stream under data parallelism.
        u = jax.random.uniform(self.per_shard_rng(rng), p_r1.shape)
        ranker_labels = jnp.ceil(p_r1 - u)

        k_drop = self.dropout_rng(rng)

        def loss_of(params):
            scores = self.score_with_params(params, batch, rng=k_drop)
            x, z = scores, ranker_labels
            bce = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
            if mask is not None:
                loss = jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            else:
                loss = jnp.mean(bce)
            return loss + self.l2_penalty(params)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        params, opt_state = self.apply_updates(
            self.optimizer(), state.params, state.opt_state, grads)

        # M-step: EMA toward the batch-mean posterior examination
        # probability (ref :184-187); synced across replicas.
        target = self.sync(jnp.mean(
            clicks + (1.0 - clicks) * p_e1_r0_c0, axis=0, keepdims=True))
        alpha = self.hparams.EM_step_size
        new_propensity = (1.0 - alpha) * propensity + alpha * target

        return state.replace(
            params=params, opt_state=opt_state,
            aux={"propensity": new_propensity},
            step=state.step + 1), {"loss": loss}
