"""Linear ranker: LayerNorm -> Linear(F, 1).

Capability parity with ref ``ultra/ranking_model/Linear.py:11-78`` (input
LayerNorm then a single scoring projection), scoring whole ``[B, L, F]``
lists at once instead of concatenating per-position slices.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.models import base
from ultra_pytorch_tpu.utils.registry import register


@register("ranker", "Linear", aliases=["ultra.ranking_model.Linear"])
class Linear(base.BaseRanker):

    def default_hparams(self):
        return {"norm": "layer"}

    def init(self, rng: jax.Array, feature_size: int):
        self.feature_size = feature_size
        return {
            "norm": base.layer_norm_init(feature_size),
            "out": base.linear_init(rng, feature_size, 1),
        }

    def apply(self, params, features: jax.Array,
              mask: Optional[jax.Array] = None, *,
              rng=None, is_training: bool = False) -> jax.Array:
        x = features
        if self.hparams.norm == "layer":
            x = base.apply_layer_norm(params["norm"], x)
        scores = base.apply_linear(params["out"], x)  # [B, L, 1]
        return jnp.squeeze(scores, -1)
