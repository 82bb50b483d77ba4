"""Dual Learning Algorithm (DLA): joint ranker + propensity estimation.

Capability parity with ref ``ultra/learning_algorithm/dla.py`` (Ai et al.,
SIGIR'18). One fused train step computes:

  * ranker scores over the top-``selection_bias_cutoff`` list;
  * position-propensity logits from the DenoisingNet — which in the reference
    feeds one-hot position vectors through Linear(L, 1) + ELU
    (ref ``dla.py:24-48``), i.e. the logits are exactly ``elu(w + b)`` per
    position, independent of the batch; here that is stored directly as a
    ``[L]``-weight + bias tower;
  * stop-gradient IPW weights ``p_0 / p_i`` from normalized propensities
    (``get_normalized_weights``, ref ``dla.py:287-306``) with optional
    ``max_propensity_weight`` clipping;
  * the symmetric relevance weights from normalized ranker scores
    (ref ``dla.py:217-224``);
  * ``loss = exam_loss + ranker_loss_weight * rank_loss`` with two
    optimizers at separate learning rates, each gradient clipped separately
    (``separate_gradient_update``, ref ``dla.py:141-177``).

Both towers and both optimizer states live in the TrainState so resume is
lossless (the reference checkpoints only the ranker, ref ``main.py:198-214``).

Behavioral divergence (documented, deliberate): the reference
re-instantiates its Adagrad optimizers EVERY step (``self.optimizer_func``
holds the class, ref ``dla.py:127,153-154``), so its accumulator never
persists and each update is ``~ -lr * sign(g)`` — constant-magnitude steps
that converge fast early but cannot anneal (its at-scale runs collapse
mid-training; BASELINE.md r5 non-PBM section). The default here is TRUE
persistent-accumulator Adagrad; set ``grad_strategy=ada_reset`` to
reproduce the reference's exact dynamics (step-equivalence evidence:
``tools/replay_dla.py``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.algorithms.base import (
    BaseAlgorithm, TrainState, make_optimizer)
from ultra_pytorch_tpu.models import base as model_base
from ultra_pytorch_tpu.utils.registry import register


def sigmoid_prob(logits: jax.Array) -> jax.Array:
    """sigmoid(logits - mean(logits)) (ref ``dla.py:21-22``)."""
    return jax.nn.sigmoid(logits - jnp.mean(logits, axis=-1, keepdims=True))


@register("algorithm", "DLA", aliases=["ultra.learning_algorithm.DLA"])
class DLA(BaseAlgorithm):

    name = "dla"

    def default_hparams(self):
        # ref dla.py:71-86
        return {
            "learning_rate": 0.05,
            "max_gradient_norm": 5.0,
            "loss_func": "softmax_loss",
            "logits_to_prob": "softmax",
            "propensity_learning_rate": -1.0,
            "ranker_loss_weight": 1.0,
            "l2_loss": 0.0,
            "max_propensity_weight": -1.0,
            "constant_propensity_initialization": False,
            "grad_strategy": "ada",
        }

    # -- propensity tower --------------------------------------------------
    def _propensity_logits(self, prop_params) -> jax.Array:
        """[L] position propensity logits = elu(w + b)."""
        return jax.nn.elu(prop_params["w"] + prop_params["b"])

    def _logits_to_prob(self, logits: jax.Array) -> jax.Array:
        if self.hparams.logits_to_prob == "sigmoid":
            return sigmoid_prob(logits)
        return jax.nn.softmax(logits, axis=-1)

    def _normalized_weights(self, propensity: jax.Array) -> jax.Array:
        """pw_i = p_0 / p_i with optional clip (ref ``dla.py:287-306``)."""
        pw = propensity[:, 0:1] / propensity
        if self.hparams.max_propensity_weight > 0:
            pw = jnp.clip(pw, 0.0, self.hparams.max_propensity_weight)
        return pw

    # -- state -------------------------------------------------------------
    def _optimizers(self):
        lr = float(self.hparams.learning_rate)
        plr = float(self.hparams.propensity_learning_rate)
        plr = lr if plr < 0 else plr
        mgn = float(self.hparams.max_gradient_norm)
        gs = self.hparams.grad_strategy
        return (make_optimizer(gs, lr, mgn), make_optimizer(gs, plr, mgn))

    def init_state(self, rng: jax.Array, feature_size: int) -> TrainState:
        k_rank, k_prop = jax.random.split(rng)
        params = self.ranker.init(k_rank, feature_size)
        L = self.rank_list_size
        if self.hparams.constant_propensity_initialization:
            prop = {"w": jnp.full((L,), 0.001), "b": jnp.zeros(())}
        else:
            # one-hot(i) @ W + b == W[i, 0] + b; keep the torch-default init.
            lin = model_base.linear_init(k_prop, L, 1)
            prop = {"w": lin["w"][:, 0], "b": lin["b"][0]}
        opt_r, opt_p = self._optimizers()
        aux = {
            "propensity": prop,
            "prop_opt_state": opt_p.init(prop),
        }
        return TrainState(params=params, opt_state=opt_r.init(params),
                          aux=aux, step=jnp.zeros((), jnp.int32))

    # -- train -------------------------------------------------------------
    def train_step(self, state: TrainState, batch: Dict[str, jax.Array], rng):
        batch = self.train_slice(batch)
        labels = batch["labels"]  # clicks, [B, L]
        mask = batch.get("mask")
        B = labels.shape[0]

        k_drop = self.dropout_rng(rng)

        def loss_of(params, prop_params):
            scores = self.score_with_params(params, batch, rng=k_drop)
            prop_logits = jnp.broadcast_to(
                self._propensity_logits(prop_params)[None, :],
                labels.shape)

            pw = jax.lax.stop_gradient(
                self._normalized_weights(self._logits_to_prob(prop_logits)))
            rank_loss = self.loss_fn(scores, labels, pw, mask=mask)

            rw = jax.lax.stop_gradient(
                self._normalized_weights(self._logits_to_prob(scores)))
            exam_loss = self.loss_fn(prop_logits, labels, rw, mask=mask)

            rank_loss = rank_loss + self.l2_penalty(params)
            loss = exam_loss + self.hparams.ranker_loss_weight * rank_loss
            return loss, (rank_loss, exam_loss)

        (loss, (rank_loss, exam_loss)), grads = jax.value_and_grad(
            loss_of, argnums=(0, 1), has_aux=True)(
                state.params, state.aux["propensity"])
        g_rank, g_prop = grads

        opt_r, opt_p = self._optimizers()
        params, opt_state = self.apply_updates(
            opt_r, state.params, state.opt_state, g_rank)
        prop, prop_opt_state = self.apply_updates(
            opt_p, state.aux["propensity"], state.aux["prop_opt_state"],
            g_prop)

        new_state = state.replace(
            params=params, opt_state=opt_state,
            aux={"propensity": prop, "prop_opt_state": prop_opt_state},
            step=state.step + 1)
        return new_state, {"loss": loss, "rank_loss": rank_loss,
                           "exam_loss": exam_loss}
