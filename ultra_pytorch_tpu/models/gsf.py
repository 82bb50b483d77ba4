"""GSF: Groupwise Scoring Function.

Advertised by the reference README ("Ranking Models" §4) but never
implemented there (SURVEY.md §2.5) — implemented here from the paper:

  * Qingyao Ai, Xuanhui Wang, Sebastian Bruch, Nadav Golbandi, Michael
    Bendersky, Marc Najork. 2019. Learning Groupwise Multivariate Scoring
    Functions Using Deep Neural Networks. In ICTIR '19.

A group of ``group_size`` documents is scored JOINTLY by a DNN over the
concatenation of their features; a document's final score accumulates its
per-group scores over all circular sliding-window groups it belongs to
(size-m windows starting at every position, the standard efficient GSF
approximation). Groups containing padded positions contribute only through
their valid members.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.models import base
from ultra_pytorch_tpu.utils.registry import register


@register("ranker", "GSF", aliases=["ultra.ranking_model.GSF"])
class GSF(base.BaseRanker):

    def default_hparams(self):
        return {
            "group_size": 2,
            "hidden_layer_sizes": [256, 128],
            "activation_func": "elu",
            "norm": "layer",
        }

    def init(self, rng: jax.Array, feature_size: int):
        self.feature_size = feature_size
        hp = self.hparams
        m = hp.group_size
        sizes = [feature_size * m] + list(hp.hidden_layer_sizes) + [m]
        keys = jax.random.split(rng, len(sizes))
        layers = []
        for j in range(len(sizes) - 1):
            layers.append({
                "norm": base.layer_norm_init(sizes[j]),
                "linear": base.linear_init(keys[j], sizes[j], sizes[j + 1]),
            })
        return {"input_norm": base.layer_norm_init(feature_size),
                "layers": layers}

    def _group_net(self, params, g):
        """[..., m*F] -> [..., m] joint scores."""
        act = base.ACTIVATIONS[self.hparams.activation_func]
        use_norm = self.hparams.norm == "layer"
        h = g
        n = len(params["layers"])
        for j, layer in enumerate(params["layers"]):
            if use_norm:
                h = base.apply_layer_norm(layer["norm"], h)
            h = base.apply_linear(layer["linear"], h)
            if j != n - 1:
                h = act(h)
        return h

    def apply(self, params, features: jax.Array,
              mask: Optional[jax.Array] = None, *,
              rng=None, is_training: bool = False) -> jax.Array:
        B, L, F = features.shape
        m = int(self.hparams.group_size)
        x = features
        if self.hparams.norm == "layer":
            x = base.apply_layer_norm(params["input_norm"], x)

        # Circular sliding windows: group g starts at position g and holds
        # positions (g, g+1, ..., g+m-1) mod L.  [B, L, m, F]
        idx = (jnp.arange(L)[:, None] + jnp.arange(m)[None, :]) % L
        groups = x[:, idx, :]                       # [B, L, m, F]
        flat = groups.reshape(B, L, m * F)
        scores_m = self._group_net(params, flat)     # [B, L, m]

        # Scatter each member's score back to its document and average over
        # the m groups every document belongs to.
        member_pos = idx                              # [L, m]
        contrib = jnp.zeros((B, L))
        for j in range(m):
            contrib = contrib.at[:, member_pos[:, j]].add(scores_m[:, :, j])
        scores = contrib / m
        return scores
