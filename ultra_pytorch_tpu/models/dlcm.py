"""DLCM: Deep Listwise Context Model.

The reference ADVERTISES this ranker (ref ``README.md`` "Ranking Models"
§3, test config ``tests/test_settings/DLCM.json``) but never implemented it
(commented out of ``ultra/ranking_model/__init__.py:8-10``, SURVEY.md §2.5)
— implemented here from the paper:

  * Qingyao Ai, Keping Bi, Jiafeng Guo, W. Bruce Croft. 2018. Learning a
    Deep Listwise Context Model for Ranking Refinement. In SIGIR '18.

Architecture: an input projection, a GRU that encodes the candidate list
from the LOWEST position upward into a local context vector s, and the
local ranking function ``phi(x_i, s) = v^T tanh(W_x x_i + W_s s + b)``
scoring every document against that context. The GRU runs as a
``lax.scan`` over positions; everything else is batched matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.models import base
from ultra_pytorch_tpu.utils.registry import register


def _gru_init(rng, in_dim, hidden):
    k = jax.random.split(rng, 3)
    return {
        "wz": base.linear_init(k[0], in_dim + hidden, hidden),
        "wr": base.linear_init(k[1], in_dim + hidden, hidden),
        "wh": base.linear_init(k[2], in_dim + hidden, hidden),
    }


def _gru_step(p, h, x):
    hx = jnp.concatenate([x, h], axis=-1)
    z = jax.nn.sigmoid(base.apply_linear(p["wz"], hx))
    r = jax.nn.sigmoid(base.apply_linear(p["wr"], hx))
    hxr = jnp.concatenate([x, r * h], axis=-1)
    h_tilde = jnp.tanh(base.apply_linear(p["wh"], hxr))
    return (1.0 - z) * h + z * h_tilde


@register("ranker", "DLCM", aliases=["ultra.ranking_model.DLCM"])
class DLCM(base.BaseRanker):

    def default_hparams(self):
        return {
            "embed_size": 64,     # input projection width
            "hidden_size": 64,    # GRU state width
            "norm": "layer",
        }

    def init(self, rng: jax.Array, feature_size: int):
        self.feature_size = feature_size
        hp = self.hparams
        k = jax.random.split(rng, 5)
        return {
            "input_norm": base.layer_norm_init(feature_size),
            "embed": base.linear_init(k[0], feature_size, hp.embed_size),
            "gru": _gru_init(k[1], hp.embed_size, hp.hidden_size),
            "phi_x": base.linear_init(k[2], hp.embed_size, hp.hidden_size),
            "phi_s": base.linear_init(k[3], hp.hidden_size, hp.hidden_size),
            "phi_v": base.linear_init(k[4], hp.hidden_size, 1),
        }

    def apply(self, params, features: jax.Array,
              mask: Optional[jax.Array] = None, *,
              rng=None, is_training: bool = False) -> jax.Array:
        B, L, F = features.shape
        x = features
        if self.hparams.norm == "layer":
            x = base.apply_layer_norm(params["input_norm"], x)
        x = jnp.tanh(base.apply_linear(params["embed"], x))  # [B, L, E]

        # Encode from the lowest position upward (paper §3.1); padded
        # positions carry the state through unchanged.
        def step(h, inputs):
            xt, mt = inputs
            h_new = _gru_step(params["gru"], h, xt)
            if mt is not None:
                h_new = jnp.where(mt[:, None] > 0, h_new, h)
            return h_new, None

        xs = jnp.flip(x, axis=1).transpose(1, 0, 2)          # [L, B, E]
        ms = (jnp.flip(mask, axis=1).T if mask is not None
              else jnp.ones((L, B)))
        h0 = jnp.zeros((B, self.hparams.hidden_size))
        s, _ = jax.lax.scan(step, h0, (xs, ms))              # [B, H]

        # phi(x_i, s) = v^T tanh(W_x x_i + W_s s + b)
        ctx = base.apply_linear(params["phi_s"], s)[:, None, :]
        hidden = jnp.tanh(base.apply_linear(params["phi_x"], x) + ctx)
        scores = base.apply_linear(params["phi_v"], hidden)
        return jnp.squeeze(scores, -1)
