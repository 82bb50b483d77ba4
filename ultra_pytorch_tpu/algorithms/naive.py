"""Naive algorithm: train directly on the fed labels/clicks.

Capability parity with ref ``ultra/learning_algorithm/navie_algorithm.py``
(sic): scores the training list and applies the selected loss
(sigmoid / pairwise / softmax, ref ``:98-106``) with no debiasing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.algorithms.base import BaseAlgorithm, TrainState
from ultra_pytorch_tpu.utils.registry import register


@register("algorithm", "NaiveAlgorithm",
          aliases=["ultra.learning_algorithm.NavieAlgorithm",
                   "ultra.learning_algorithm.NaiveAlgorithm"])
class NaiveAlgorithm(BaseAlgorithm):

    name = "naive"

    def train_step(self, state: TrainState, batch, rng):
        batch = self.train_slice(batch)
        k_drop = self.dropout_rng(rng)

        def loss_of(params):
            scores = self.score_with_params(params, batch, rng=k_drop)
            loss = self.loss_fn(scores, batch["labels"],
                                mask=batch.get("mask"))
            return loss + self.l2_penalty(params)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        params, opt_state = self.apply_updates(
            self.optimizer(), state.params, state.opt_state, grads)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=state.step + 1)
        return new_state, {"loss": loss}
