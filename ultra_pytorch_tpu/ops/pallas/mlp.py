"""Fused MLP list-scoring kernel (Pallas/TPU).

The DNN ranker's whole layer chain — per-layer LayerNorm -> Linear ->
activation (ref ``ultra/ranking_model/DNN.py:43-55``) — fits comfortably in
VMEM (~1 MB of weights at the default [512, 256, 128] sizes), so one kernel
scores a row tile end-to-end with every intermediate activation staying
on-chip: HBM traffic is exactly one read of the features and one write of
the scores, versus one round-trip per layer when the matmuls are separate
XLA ops.

The public entry :func:`fused_mlp_score` is differentiable: the forward
pass runs the Pallas kernel; the backward pass recomputes the (cheap) layer
chain with plain jnp and reuses XLA's gradients, keeping correctness
trivially in sync with the reference semantics. Use
``interpret=True`` (automatic off-TPU) for CPU tests.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

TILE_N = 256
_EPS = 1e-5


def pallas_mlp_available() -> bool:
    return _PALLAS_OK


def _flatten_params(layers: Sequence[dict]) -> List[jax.Array]:
    flat = []
    for layer in layers:
        flat.append(layer["norm"]["scale"].reshape(1, -1))
        flat.append(layer["norm"]["bias"].reshape(1, -1))
        flat.append(layer["linear"]["w"])
        flat.append(layer["linear"]["b"].reshape(1, -1))
    return flat


def _layer_chain(h, flat, n_layers, act, use_norm):
    """The shared layer-chain math (used both inside the kernel and for the
    jnp recompute in the backward pass)."""
    for j in range(n_layers):
        scale, bias, w, b = flat[4 * j: 4 * j + 4]
        if use_norm:
            mean = h.mean(axis=-1, keepdims=True)
            var = ((h - mean) ** 2).mean(axis=-1, keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + _EPS) * scale + bias
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if j != n_layers - 1:
            h = act(h)
    return h


def _tpu_safe_act(act):
    """Mosaic has no lowering for ``expm1``, which ``jax.nn.elu``/``selu``
    call; substitute an exactly-equivalent exp-based formulation inside the
    kernel (the jnp backward recompute keeps the original)."""
    if act is jax.nn.elu:
        return lambda x: jnp.where(
            x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)
    if act is jax.nn.selu:
        scale, alpha = 1.0507009873554805, 1.6732632423543772
        return lambda x: scale * jnp.where(
            x > 0, x, alpha * (jnp.exp(jnp.minimum(x, 0.0)) - 1.0))
    return act


def _kernel(n_layers, act, use_norm, *refs):
    x_ref = refs[0]
    out_ref = refs[-1]
    param_refs = refs[1:-1]
    flat = [r[:] for r in param_refs]
    h = x_ref[:]
    h = _layer_chain(h, flat, n_layers, _tpu_safe_act(act), use_norm)
    out_ref[:] = h


def _forward_pallas(x, flat, n_layers, act, use_norm, interpret):
    n, f = x.shape
    n_pad = (-n) % TILE_N
    if n_pad:
        x = jnp.concatenate(
            [x, jnp.zeros((n_pad, f), x.dtype)], axis=0)
    grid = (x.shape[0] // TILE_N,)

    in_specs = [pl.BlockSpec((TILE_N, f), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for p in flat:
        in_specs.append(pl.BlockSpec(p.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, n_layers, act, use_norm)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
        interpret=interpret,
    )(x, *flat)
    return out[:n, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused(x, flat, n_layers, act, use_norm, interpret):
    return _forward_pallas(x, flat, n_layers, act, use_norm, interpret)


def _fused_fwd(x, flat, n_layers, act, use_norm, interpret):
    out = _forward_pallas(x, flat, n_layers, act, use_norm, interpret)
    return out, (x, flat)


def _fused_bwd(n_layers, act, use_norm, interpret, residuals, g):
    x, flat = residuals

    def ref_fn(x, flat):
        return _layer_chain(x, flat, n_layers, act, use_norm)[:, 0]

    _, vjp = jax.vjp(ref_fn, x, flat)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_mlp_score(params_layers: Sequence[dict], features: jax.Array,
                    activation=jax.nn.elu, use_norm: bool = True,
                    interpret: bool = None) -> jax.Array:
    """Score [B, L, F] (or [N, F]) features with the fused MLP kernel.

    `params_layers` is the DNN ranker's ``params["layers"]`` list. Returns
    [B, L] (or [N]) float32 scores.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    flat = _flatten_params(params_layers)
    batched = features.ndim == 3
    if batched:
        B, L, F = features.shape
        x = features.reshape(B * L, F)
    else:
        x = features
    out = _fused(x.astype(jnp.float32), flat,
                 len(params_layers), activation, use_norm, interpret)
    if batched:
        return out.reshape(B, L)
    return out
