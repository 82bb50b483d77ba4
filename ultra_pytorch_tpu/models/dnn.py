"""DNN ranker: per-layer (LayerNorm -> Linear -> activation) MLP.

Capability parity with ref ``ultra/ranking_model/DNN.py:11-88``:
``hidden_layer_sizes=[512, 256, 128]`` + scalar output layer, LayerNorm in
front of every Linear, activation (default elu) on all but the last layer.

TPU-first: the whole ``[B, L, F]`` batch is scored as one ``[B*L, F]``
matmul chain on the MXU (vs the reference's per-position concat/split,
``DNN.py:72-88``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.models import base
from ultra_pytorch_tpu.utils.registry import register


@register("ranker", "DNN", aliases=["ultra.ranking_model.DNN"])
class DNN(base.BaseRanker):

    def default_hparams(self):
        return {
            "hidden_layer_sizes": [512, 256, 128],
            "activation_func": "elu",
            "norm": "layer",
            # bfloat16 runs the matmuls on the MXU in half precision with
            # f32 accumulation; LayerNorm statistics stay in f32.
            "compute_dtype": "float32",
            # Fold LayerNorm's affine (gamma, beta) into the next Linear:
            # (xhat*g + b) @ W == xhat @ (g[:,None]*W) + (b@W + bias) —
            # an EXACT reparametrization that trades two activation-sized
            # elementwise passes per layer (fwd; one more bwd) for
            # weight-sized ones. The step is VPU-bound (BASELINE.md
            # roofline), so activation passes are the cost that matters.
            "fold_norm_affine": True,
            # Fused Pallas kernel: whole layer chain per row tile in VMEM
            # (ops/pallas/mlp.py); falls back to interpret mode off-TPU.
            "use_pallas": False,
        }

    def init(self, rng: jax.Array, feature_size: int):
        self.feature_size = feature_size
        sizes = [feature_size] + list(self.hparams.hidden_layer_sizes) + [1]
        keys = jax.random.split(rng, len(sizes) - 1)
        layers = []
        for j in range(len(sizes) - 1):
            layers.append({
                "norm": base.layer_norm_init(sizes[j]),
                "linear": base.linear_init(keys[j], sizes[j], sizes[j + 1]),
            })
        return {"layers": layers}

    def apply(self, params, features: jax.Array,
              mask: Optional[jax.Array] = None, *,
              rng=None, is_training: bool = False) -> jax.Array:
        act = base.ACTIVATIONS[self.hparams.activation_func]
        use_norm = self.hparams.norm == "layer"
        if self.hparams.get("use_pallas"):
            from ultra_pytorch_tpu.ops.pallas.mlp import fused_mlp_score
            return fused_mlp_score(params["layers"], features,
                                   activation=act, use_norm=use_norm)
        cdtype = base.resolve_compute_dtype(
            self.hparams.get("compute_dtype", "float32"))
        fold = use_norm and self.hparams.get("fold_norm_affine", True)
        # Mixed precision: activations (and so backward cotangents) stay in
        # cdtype through the whole chain; LayerNorm stats are f32 inside
        # apply_layer_norm; scores leave in f32 for losses/metrics.
        x = features if cdtype is None else features.astype(cdtype)
        n_layers = len(params["layers"])
        for j, layer in enumerate(params["layers"]):
            if fold:
                # Normalize WITHOUT the affine; fold (gamma, beta) into
                # the linear's weights instead (weight-sized work, done
                # once per step, vs activation-sized work per example).
                xhat = base.normalize_f32(x)
                g, b0 = layer["norm"]["scale"], layer["norm"]["bias"]
                w, b = layer["linear"]["w"], layer["linear"]["b"]
                w_eff = w * g[:, None]
                b_eff = b + b0 @ w
                if cdtype is not None:
                    x = jnp.dot(xhat.astype(cdtype), w_eff.astype(cdtype))
                    x = x + b_eff.astype(cdtype)
                else:
                    x = jnp.dot(xhat, w_eff) + b_eff
            else:
                if use_norm:
                    x = base.apply_layer_norm(layer["norm"], x)
                x = base.apply_linear(layer["linear"], x, cdtype)
            if j != n_layers - 1:
                x = act(x)
        return jnp.squeeze(x, -1).astype(jnp.float32)
