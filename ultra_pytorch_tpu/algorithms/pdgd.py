"""Pairwise Differentiable Gradient Descent (PDGD).

Capability parity with ref ``ultra/learning_algorithm/pdgd.py`` (Oosterhuis
& de Rijke, CIKM'18):

  * score the full candidate list, exponentiate ``tau``-scaled max-shifted
    scores with padded docs zeroed (ref ``:111-126``);
  * Plackett-Luce denominators are reverse cumsums; the debiasing pair
    weight is ``1 / (1 + exp(sum_log_flipped - sum_log))`` where "flipped"
    swaps the clicked/unclicked documents (ref ``:157-176``, clamped at 20);
  * training pairs are (clicked doc l, doc k) with ``label_k < label_l`` and
    ``k <= l + 1`` within the selection-bias cutoff (ref ``:138-156``);
  * loss = sum over pairs of ``weight * (-sigmoid(s_l - s_k))``
    (ref ``:193-205``).

The reference builds pairs in a per-item Python loop with numpy; here the
pair grid is a [B, L, L] broadcast and the flipped-denominator delta uses
the identity: swapping positions (lo, hi) only changes denominators
``d_m`` for ``lo < m <= hi``, each by ``e_lo - e_hi`` — so the log-sum
difference is a masked sum over one [B, L, L, L] tensor (L = cutoff, ~10).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.algorithms.base import BaseAlgorithm, TrainState
from ultra_pytorch_tpu.utils.registry import register


def pdgd_pair_weights(scores0: jax.Array, labels_full: jax.Array,
                      mask_full: jax.Array, L: int,
                      tau: float) -> jax.Array:
    """Debiasing weights for all (clicked l, candidate k) pairs.

    Returns [B, L, L] with zero at invalid pairs. Mirrors the reference's
    per-pair flipped-denominator computation (ref ``pdgd.py:138-183``)
    using the identity that swapping positions (lo, hi) changes only
    denominators d_m for lo < m <= hi, each by e_lo - e_hi.
    """
    scores0 = scores0 - jnp.max(scores0, axis=1, keepdims=True)
    e = jnp.exp(tau * scores0) * mask_full
    d = jnp.cumsum(e[:, ::-1], axis=1)[:, ::-1]
    log_d = jnp.where(d > 0, jnp.log(jnp.maximum(d, 1e-30)), 0.0)

    labels = labels_full[:, :L]
    mask = mask_full[:, :L]
    l_idx = jnp.arange(L)[:, None]
    k_idx = jnp.arange(L)[None, :]
    pair_ok = ((labels[:, :, None] > 0)
               & (labels[:, None, :] < labels[:, :, None])
               & (k_idx <= l_idx + 1)[None]
               & (mask[:, :, None] > 0) & (mask[:, None, :] > 0))

    lo = jnp.minimum(l_idx, k_idx)
    hi = jnp.maximum(l_idx, k_idx)
    e_top = e[:, :L]
    d_top = d[:, :L]
    log_d_top = log_d[:, :L]
    B = e.shape[0]
    delta = (jnp.take_along_axis(e_top, jnp.broadcast_to(
                lo.reshape(1, -1), (B, L * L)), axis=1)
             - jnp.take_along_axis(e_top, jnp.broadcast_to(
                hi.reshape(1, -1), (B, L * L)), axis=1)
             ).reshape(B, L, L)

    m_idx = jnp.arange(L)[None, None, :]
    in_range = (m_idx > lo[:, :, None]) & (m_idx <= hi[:, :, None])
    d_flip = d_top[:, None, None, :] + delta[:, :, :, None]
    log_flip = jnp.where(d_flip > 0,
                         jnp.log(jnp.maximum(d_flip, 1e-30)), 0.0)
    dlog = jnp.sum(in_range[None] *
                   (log_flip - log_d_top[:, None, None, :]), axis=-1)
    weights = 1.0 / (1.0 + jnp.exp(jnp.minimum(dlog, 20.0)))
    return weights * pair_ok


@register("algorithm", "PDGD", aliases=["ultra.learning_algorithm.PDGD"])
class PDGD(BaseAlgorithm):

    name = "pdgd"

    def default_hparams(self):
        # ref pdgd.py:46-54
        return {
            "learning_rate": 0.05,
            "tau": 1.0,
            "max_gradient_norm": 1.0,
            "l2_loss": 0.005,
            "grad_strategy": "ada",
        }

    def train_step(self, state: TrainState, batch, rng):
        labels_full = batch["labels"]             # [B, Lc] clicks
        mask_full = batch.get("mask")
        if mask_full is None:
            mask_full = jnp.ones_like(labels_full)
        L = min(self.rank_list_size, labels_full.shape[1])
        tau = float(self.hparams.tau)

        # -- no-grad pass over the full candidate list -------------------
        scores0 = self.score_with_params(state.params, batch,
                                         is_training=False)
        weights = jax.lax.stop_gradient(
            pdgd_pair_weights(scores0, labels_full, mask_full, L, tau))

        k_drop = self.dropout_rng(rng)

        def loss_of(params):
            scores = self.score_with_params(params, batch,
                                           rng=k_drop)[:, :L]
            s_l = scores[:, :, None]
            s_k = scores[:, None, :]
            pair_term = -jax.nn.sigmoid(s_l - s_k)  # == -e^l/(e^l + e^k)
            loss = jnp.sum(weights * pair_term)
            return loss + self.l2_penalty(params)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        params, opt_state = self.apply_updates(
            self.optimizer(), state.params, state.opt_state, grads)
        metrics = {"loss": loss}
        metrics.update(self.online_reward_metric(batch) or {})
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), metrics
