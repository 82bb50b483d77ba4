"""Debiased LambdaRank.

Capability parity with ref ``ultra/learning_algorithm/lambda_rank.py``
(Burges, "From RankNet to LambdaRank to LambdaMART"): sort by predictions,
build the pairwise target matrix ``std_p_ij = 0.5 (1 + clamp(l_i - l_j))``
and probability matrix ``p_ij = sigmoid(sigma * (s_i - s_j))``, weight by
|ΔNDCG| of swapping the pair, and debias with PairwiseDebias-style t+/t-
EMA state (ref ``:113-140``).

Reference quirks preserved for behavioral parity (documented, see
SURVEY.md §7 fidelity traps):
  * the BCE is applied treating ``p_ij`` (already a sigmoid) as a LOGIT —
    torch's ``BCEWithLogitsLoss(weight=delta)(p_ij, std_p_ij)``
    (ref ``:128``); we compute the identical formula;
  * the IDCG normalizer of ΔNDCG is summed over the whole BATCH, giving a
    scalar (ref ``dcg`` ``:247-266``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.algorithms.base import BaseAlgorithm, TrainState
from ultra_pytorch_tpu.utils.registry import register


def _safe_div(num, den):
    return jnp.where(den == 0, jnp.zeros_like(num),
                     num / jnp.where(den == 0, 1.0, den))


@register("algorithm", "LambdaRank",
          aliases=["ultra.learning_algorithm.LambdaRank"])
class LambdaRank(BaseAlgorithm):

    name = "lambda_rank"

    def default_hparams(self):
        # ref lambda_rank.py:42-49
        return {
            "EM_step_size": 0.05,
            "learning_rate": 0.05,
            "max_gradient_norm": 5.0,
            "grad_strategy": "ada",
            "regulation_p": 1,
            "sigma": 1.0,
        }

    def init_state(self, rng, feature_size):
        state = super().init_state(rng, feature_size)
        L = self.rank_list_size
        return state.replace(aux={
            "t_plus": jnp.ones((L,)),
            "t_minus": jnp.ones((L,)),
        })

    def delta_ndcg(self, ideal_sorted, labels_sorted_via_preds):
        """|ΔNDCG| matrix of pairwise swaps (ref ``:268-291``), with the
        reference's batch-summed scalar IDCG (ref ``:247-266``)."""
        L = ideal_sorted.shape[1]
        pos = jnp.arange(1, L + 1, dtype=jnp.float32)
        idcg = jnp.sum(_safe_div(2.0 ** ideal_sorted - 1.0,
                                 jnp.log(pos + 1.0)[None, :]))
        gains = 2.0 ** labels_sorted_via_preds - 1.0
        n_gains = _safe_div(gains, jnp.broadcast_to(idcg, gains.shape))
        ng_diffs = n_gains[:, :, None] - n_gains[:, None, :]
        dists = 1.0 / jnp.log2(jnp.arange(L, dtype=jnp.float32) + 2.0)
        dist_diffs = dists[:, None] - dists[None, :]
        return jnp.abs(ng_diffs) * jnp.abs(dist_diffs)[None]

    def _pair_matrices(self, scores, labels):
        order = jnp.argsort(-scores, axis=1, stable=True)
        preds_sorted = jnp.take_along_axis(scores, order, axis=1)
        labels_sorted = jnp.take_along_axis(labels, order, axis=1)
        std_diffs = labels_sorted[:, :, None] - labels_sorted[:, None, :]
        std_p_ij = 0.5 * (1.0 + jnp.clip(std_diffs, -1.0, 1.0))
        s_ij = preds_sorted[:, :, None] - preds_sorted[:, None, :]
        p_ij = jax.nn.sigmoid(self.hparams.sigma * s_ij)
        ideal_sorted = jnp.sort(labels, axis=1)[:, ::-1]
        delta = self.delta_ndcg(ideal_sorted, labels_sorted)
        return p_ij, std_p_ij, delta

    def train_step(self, state: TrainState, batch, rng):
        batch = self.train_slice(batch)
        clicks = batch["labels"]
        t_plus = state.aux["t_plus"]
        t_minus = state.aux["t_minus"]

        k_drop = self.dropout_rng(rng)

        def loss_of(params):
            scores = self.score_with_params(params, batch, rng=k_drop)
            p_ij, std_p_ij, delta = self._pair_matrices(scores, clicks)
            # BCE-with-logits applied to p_ij (reference quirk, ref :128).
            x, z = p_ij, std_p_ij
            bce = (jnp.maximum(x, 0.0) - x * z
                   + jnp.log1p(jnp.exp(-jnp.abs(x)))) * delta
            pair_loss = jnp.sum(bce, axis=0)                 # [L, L]
            loss = jnp.sum(_safe_div(
                pair_loss, t_plus[:, None] * t_minus[None, :]))
            return loss, pair_loss

        (loss, pair_loss), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        params, opt_state = self.apply_updates(
            self.optimizer(), state.params, state.opt_state, grads)

        pair_loss = self.sync(jax.lax.stop_gradient(pair_loss))
        t_plus_loss = jnp.sum(pair_loss / t_minus[None, :], axis=1)
        t_minus_loss = jnp.sum(pair_loss.T / t_plus[None, :], axis=1)
        alpha = self.hparams.EM_step_size
        power = 1.0 / (self.hparams.regulation_p + 1.0)

        def ema(t, t_loss):
            return (1 - alpha) * t + alpha * jnp.power(
                _safe_div(t_loss, jnp.broadcast_to(t_loss[0], t_loss.shape)),
                power)

        return state.replace(
            params=params, opt_state=opt_state,
            aux={"t_plus": ema(t_plus, t_plus_loss),
                 "t_minus": ema(t_minus, t_minus_loss)},
            step=state.step + 1), {"loss": loss}
