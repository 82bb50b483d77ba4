"""Pairwise Debiasing (Unbiased LambdaMART-style) algorithm.

Capability parity with ref ``ultra/learning_algorithm/pairwise_debias.py``
(Hu et al. WWW'19):

  * for every ordered position pair (i, j):
    ``valid_pair = min(1, relu(l_i - l_j))`` per item and
    ``pair_loss[i, j] = sum_b valid_pair * log(1 + exp(s_j - s_i))``
    (ref ``:142-153``);
  * debiased loss ``sum_ij pair_loss / (t+_i * t-_j)`` (ref ``:156-157``);
  * EMA power-updates of the position-bias ratios
    ``t+ <- (1-a) t+ + a * (t_plus_loss / t_plus_loss[0])^(1/(p+1))``
    (ref ``:159-163``).

The reference's O(L^2) Python double loop is one [B, L, L] broadcast here,
and t+/t- live in TrainState.aux (synced under data parallelism).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.algorithms.base import BaseAlgorithm, TrainState
from ultra_pytorch_tpu.utils.registry import register


@register("algorithm", "PairDebias",
          aliases=["ultra.learning_algorithm.PairDebias"])
class PairDebias(BaseAlgorithm):

    name = "pairwise_debias"

    def default_hparams(self):
        # ref pairwise_debias.py:53-62
        return {
            "EM_step_size": 0.05,
            "learning_rate": 0.005,
            "max_gradient_norm": 5.0,
            "regulation_p": 1,
            "l2_loss": 0.0,
            "grad_strategy": "ada",
        }

    def init_state(self, rng, feature_size):
        state = super().init_state(rng, feature_size)
        L = self.rank_list_size
        return state.replace(aux={
            "t_plus": jnp.ones((L,)),
            "t_minus": jnp.ones((L,)),
        })

    def _pair_loss_matrix(self, scores, labels, mask):
        """[L, L] matrix of batch-summed valid-pair CE losses."""
        l_i = labels[:, :, None]
        l_j = labels[:, None, :]
        valid_pair = jnp.minimum(1.0, jax.nn.relu(l_i - l_j))
        if mask is not None:
            valid_pair = valid_pair * mask[:, :, None] * mask[:, None, :]
        s_i = scores[:, :, None]
        s_j = scores[:, None, :]
        ce = jnp.log1p(jnp.exp(-(s_i - s_j)))  # pairwise CE (ref :228-248)
        return jnp.sum(valid_pair * ce, axis=0)  # [L, L]

    def train_step(self, state: TrainState, batch, rng):
        batch = self.train_slice(batch)
        clicks = batch["labels"]
        mask = batch.get("mask")
        t_plus = state.aux["t_plus"]      # [L]
        t_minus = state.aux["t_minus"]    # [L]
        L = clicks.shape[1]
        off_diag = 1.0 - jnp.eye(L)

        k_drop = self.dropout_rng(rng)

        def loss_of(params):
            scores = self.score_with_params(params, batch, rng=k_drop)
            pair_loss = self._pair_loss_matrix(scores, clicks, mask) * off_diag
            inv = 1.0 / (t_plus[:, None] * t_minus[None, :])
            loss = jnp.sum(pair_loss * inv)
            return loss + self.l2_penalty(params), pair_loss

        (loss, pair_loss), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        params, opt_state = self.apply_updates(
            self.optimizer(), state.params, state.opt_state, grads)

        # t+/t- EMA updates (ref :159-163), cross-replica synced.
        pair_loss = self.sync(pair_loss)
        t_plus_loss = jnp.sum(pair_loss / t_minus[None, :], axis=1)   # [L]
        t_minus_loss = jnp.sum(pair_loss / t_plus[:, None], axis=0)   # [L]
        alpha = self.hparams.EM_step_size
        power = 1.0 / (self.hparams.regulation_p + 1.0)

        def ema(t, t_loss):
            ratio = jnp.where(t_loss[0] > 0, t_loss / t_loss[0], 1.0)
            return (1 - alpha) * t + alpha * jnp.power(ratio, power)

        return state.replace(
            params=params, opt_state=opt_state,
            aux={"t_plus": ema(t_plus, t_plus_loss),
                 "t_minus": ema(t_minus, t_minus_loss)},
            step=state.step + 1), {"loss": loss}
