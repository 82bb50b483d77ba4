"""Ranker protocol: param-pytree ``init``/``apply`` scorers.

Replaces the reference's ``BaseRankingModel`` OO protocol
(ref ``ultra/ranking_model/base_ranking_model.py:87-102``: concat per-position
tensors -> net -> split back) with whole-list scoring: a ranker maps
``[B, L, F]`` features to ``[B, L]`` scores in one shot, so the full batch
rides the MXU as a single ``[B*L, F] @ [F, H]`` matmul chain.

Parameter-noise perturbation for the DBGD family (ref noisy_params protocol,
``ultra/ranking_model/Linear.py:69-75``) becomes pure pytree arithmetic:
``perturb(params, noise, rate) = params + rate * noise``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.utils.hparams import HParams

Params = Any  # nested dict pytree

# Activation menu mirroring ref base_ranking_model.py:63-69.
ACTIVATIONS: Dict[str, Callable] = {
    "elu": jax.nn.elu,
    "relu": jax.nn.relu,
    "selu": jax.nn.selu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


class BaseRanker:
    """A ranker owns hparams and exposes pure init/apply."""

    def __init__(self, hparams_str: str = "", feature_size: int = 0):
        self.hparams = HParams(**self.default_hparams())
        self.hparams.parse(hparams_str or "")
        self.feature_size = feature_size

    def default_hparams(self) -> Dict[str, Any]:
        return {}

    def init(self, rng: jax.Array, feature_size: int) -> Params:
        raise NotImplementedError

    def apply(self, params: Params, features: jax.Array,
              mask: Optional[jax.Array] = None, *,
              rng: Optional[jax.Array] = None,
              is_training: bool = False) -> jax.Array:
        """[B, L, F] -> [B, L] scores."""
        raise NotImplementedError


# -- torch-compatible initializers (convergence parity with the reference,
#    which relies on torch.nn.Linear's default U(-1/sqrt(fan_in), ...)) -----

def linear_init(rng: jax.Array, fan_in: int, fan_out: int):
    kw, kb = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def layer_norm_init(dim: int):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def apply_linear(p, x, compute_dtype=None):
    """Dense layer; with a low-precision `compute_dtype` the matmul runs in
    that dtype on the MXU (hardware-f32 accumulation) and the OUTPUT stays
    in that dtype. Keeping activations — and therefore cotangents — in the
    low dtype is what makes the BACKWARD dots low-precision too: an f32
    cotangent against a bf16 weight is a mixed dot that XLA upcasts to a
    full-rate f32 matmul, silently forfeiting ~all of bf16's gain (the r2
    'bf16 is slower' measurement, BASELINE.md)."""
    if compute_dtype is not None:
        return (jnp.dot(x.astype(compute_dtype),
                        p["w"].astype(compute_dtype))
                + p["b"].astype(compute_dtype))
    return x @ p["w"] + p["b"]


def resolve_compute_dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float16": jnp.float16}.get(name)


LN_EPS = 1e-5  # the ONE LayerNorm eps (shared with ops/pallas/mlp.py)


def normalize_f32(x, eps: float = LN_EPS):
    """Pre-affine LayerNorm normalization (x - mean) * rsqrt(var + eps)
    with float32 statistics (mean/variance of a bf16 input would lose ~3
    decimal digits); returns f32. Variance via E[x^2]-E[x]^2: one
    traversal of the (large) input instead of two — the train step is
    VPU-bound, not MXU-bound (BASELINE.md roofline), so elementwise passes
    over [B*L, F] are the cost that matters; the cancellation risk is
    benign at LTR feature scales (|x| ~ 1). Shared by the plain and
    norm-affine-folded DNN paths so the statistics can never diverge."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = (x32 * x32).mean(-1, keepdims=True) - mean * mean
    return (x32 - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)


def apply_layer_norm(p, x, eps: float = LN_EPS):
    """LayerNorm (normalize_f32 + affine); output in the input's dtype."""
    out = normalize_f32(x, eps) * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def dropout(rng: Optional[jax.Array], x: jax.Array, rate: float,
            is_training: bool) -> jax.Array:
    """Inverted dropout (torch ``nn.Dropout`` semantics: train-time scale by
    1/(1-rate), eval identity). `rate` and `is_training` are Python values
    (static under jit); a missing rng with rate>0 in training is an ERROR,
    not a silent no-op — silent-no-op hparams are how config drift starts
    (VERDICT r3 weak #4)."""
    if not is_training or rate <= 0.0:
        return x
    if rng is None:
        raise ValueError(
            "dropout rate>0 in training mode requires an rng; thread one "
            "through ranker.apply(..., rng=...) (see BaseAlgorithm."
            "score_with_params)")
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))


# -- DBGD-family noise utilities ------------------------------------------

_NOISE_KEYS = ("linear", "out", "fc1", "fc2", "mha_dense", "input_embed",
               "output")
_FROZEN_KEYS = ("norm", "ln1", "ln2")


def noise_spec(params: Params) -> Params:
    """0/1 pytree marking which leaves the DBGD family perturbs: the linear
    scorer weights, NOT the normalization params (the reference perturbs
    only sublayers whose name contains "linear", ref ``dbgd.py:226-231``)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        frozen = any(k in _FROZEN_KEYS for k in keys)
        noisy = any(k in _NOISE_KEYS for k in keys) and not frozen
        out.append(jnp.ones_like(leaf) if noisy else jnp.zeros_like(leaf))
    return jax.tree_util.tree_unflatten(treedef, out)


def dbgd_noise_like(rng: jax.Array, params: Params) -> Params:
    """Unit noise for the DBGD family: N(0,1) normalized along axis 0
    (torch ``F.normalize(..., dim=0)``, ref ``dbgd.py:230``), masked to the
    perturbable leaves."""
    spec = noise_spec(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    spec_leaves = jax.tree_util.tree_leaves(spec)
    keys = jax.random.split(rng, len(leaves))
    noise = []
    for k, leaf, s in zip(keys, leaves, spec_leaves):
        n = jax.random.normal(k, leaf.shape, leaf.dtype)
        if n.ndim >= 1:
            norm = jnp.sqrt(jnp.sum(n ** 2, axis=0, keepdims=True))
            n = n / jnp.maximum(norm, 1e-12)
        noise.append(n * s)
    return jax.tree_util.tree_unflatten(treedef, noise)

def sample_noise_like(rng: jax.Array, params: Params,
                      normalize_per_leaf: bool = True) -> Params:
    """Unit Gaussian noise shaped like `params`; each leaf normalized to unit
    L2 norm, matching the reference's per-parameter normalization
    (ref ``dbgd.py:224-231`` create_noisy_param)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(rng, len(leaves))
    noise = []
    for k, leaf in zip(keys, leaves):
        n = jax.random.normal(k, leaf.shape, leaf.dtype)
        if normalize_per_leaf:
            n = n / (jnp.linalg.norm(n.reshape(-1)) + 1e-12)
        noise.append(n)
    return jax.tree_util.tree_unflatten(treedef, noise)


def perturb(params: Params, noise: Params, rate: float) -> Params:
    """params + rate * noise (the functional form of the reference's in-place
    noisy_params update, ref ``DNN.py:79-86``)."""
    return jax.tree_util.tree_map(lambda p, n: p + rate * n, params, noise)
