"""SetRank: permutation-invariant transformer-encoder scorer.

Capability parity with ref ``ultra/ranking_model/SetRank.py:194-255``
(SIGIR'20 SetRank): input LayerNorm -> FFN embedding (F -> dff -> relu ->
d_model) -> N encoder layers (multi-head self-attention over the candidate
list + FFN, post-norm residuals) -> FFN output head (d_model -> dff -> relu
-> 1). Mirrors the reference's attention exactly: q = k = v = x with NO
input projections (ref ``SetRank.py:33-59`` — the wq/wk/wv projections are
commented out there), only the output dense projection.

Divergence (improvement, documented): padded positions are masked out of the
attention softmax when a validity mask is provided; the reference attends to
PAD rows (it passes ``mask=None``, ``SetRank.py:243``).

Default hparams d_model=256, num_heads=8, num_layers=2, dff("diff")=64
(ref ``SetRank.py:213-220``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.models import base
from ultra_pytorch_tpu.utils.registry import register


def _ffn_init(rng, d_in, dff, d_out):
    k1, k2 = jax.random.split(rng)
    return {"fc1": base.linear_init(k1, d_in, dff),
            "fc2": base.linear_init(k2, dff, d_out)}


def _ffn_apply(p, x):
    return base.apply_linear(p["fc2"], jax.nn.relu(base.apply_linear(p["fc1"], x)))


@register("ranker", "SetRank", aliases=["ultra.ranking_model.SetRank"])
class SetRank(base.BaseRanker):

    def default_hparams(self):
        return {
            "d_model": 256,
            "num_heads": 8,
            "num_layers": 2,
            "diff": 64,        # dff; keeps the reference's hparam name
            # Dropout rate, applied at the reference's three sites
            # (SetRank.py:103-147): after the input embedding and after
            # each layer's attention / FFN sublayer outputs (pre-residual).
            "rate": 0.0,
        }

    def init(self, rng: jax.Array, feature_size: int):
        self.feature_size = feature_size
        hp = self.hparams
        keys = jax.random.split(rng, hp.num_layers + 2)
        layers = []
        for i in range(hp.num_layers):
            k_dense, k_ffn = jax.random.split(keys[i])
            layers.append({
                "mha_dense": base.linear_init(k_dense, hp.d_model, hp.d_model),
                "ffn": _ffn_init(k_ffn, hp.d_model, hp.diff, hp.d_model),
                "ln1": base.layer_norm_init(hp.d_model),
                "ln2": base.layer_norm_init(hp.d_model),
            })
        return {
            "input_norm": base.layer_norm_init(feature_size),
            "input_embed": _ffn_init(keys[-2], feature_size, hp.diff,
                                     hp.d_model),
            "output": _ffn_init(keys[-1], hp.d_model, hp.diff, 1),
            "layers": layers,
        }

    def _attention(self, p, x, attn_mask):
        """Identity-q/k/v multi-head attention with output projection
        (ref SetRank.py:46-80, 156-191)."""
        B, L, D = x.shape
        H = self.hparams.num_heads
        depth = D // H
        split = lambda t: t.reshape(B, L, H, depth).transpose(0, 2, 1, 3)
        q = k = v = split(x)                              # [B, H, L, depth]
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(depth, jnp.float32))
        if attn_mask is not None:
            logits = logits + attn_mask
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return base.apply_linear(p["mha_dense"], out)

    def apply(self, params, features: jax.Array,
              mask: Optional[jax.Array] = None, *,
              rng=None, is_training: bool = False) -> jax.Array:
        eps = 1e-6
        rate = float(self.hparams.rate)
        attn_mask = None
        if mask is not None:
            # [B, 1, 1, L]: -1e9 on padded keys.
            attn_mask = (1.0 - mask)[:, None, None, :] * -1e9

        drop_on = is_training and rate > 0.0
        if drop_on and rng is None:
            raise ValueError(
                "SetRank rate>0 needs a training rng (pass rng= through "
                "apply; the algorithm layer threads one automatically)")
        n_drop = 1 + 2 * len(params["layers"])
        keys = (iter(jax.random.split(rng, n_drop)) if drop_on
                else iter([None] * n_drop))

        x = base.apply_layer_norm(params["input_norm"], features, eps)
        x = _ffn_apply(params["input_embed"], x)
        x = base.dropout(next(keys), x, rate, is_training)
        for layer in params["layers"]:
            attn = self._attention(layer, x, attn_mask)
            attn = base.dropout(next(keys), attn, rate, is_training)
            x = base.apply_layer_norm(layer["ln1"], x + attn, eps)
            ffn = _ffn_apply(layer["ffn"], x)
            ffn = base.dropout(next(keys), ffn, rate, is_training)
            x = base.apply_layer_norm(layer["ln2"], x + ffn, eps)
        scores = _ffn_apply(params["output"], x)          # [B, L, 1]
        return jnp.squeeze(scores, -1)
