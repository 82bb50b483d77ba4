"""Fused propensity-weighted listwise softmax loss (Pallas/TPU).

One kernel computes the reference's ``softmax_loss`` semantics
(ref ``ultra/learning_algorithm/base_algorithm.py:309-330``: weighted
labels ``(y + 1e-7) * pw``, per-list CE against their normalized
distribution, weighted-sum normalization) for a whole [B, L] batch in VMEM;
the backward pass is a second Pallas kernel computing the analytic gradient

    d loss / d s = (denom_b / total) * (softmax(s~) - label_dis) * mask

so neither direction materializes intermediates in HBM. Propensity weights
and labels are treated as constants (they are stop-gradient data in every
algorithm that uses this loss, e.g. ref ``dla.py:200-204``).

Ranking batches are small (B<=1024, L<=~100s), so a single grid cell holds
the whole batch; the win is fusion, not tiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-7
_NEG = -1e9


def _prep(s_ref, y_ref, w_ref, m_ref):
    s = s_ref[:]
    m = m_ref[:]
    wl = (y_ref[:] + _EPS) * w_ref[:] * m
    denom = jnp.sum(wl, axis=1, keepdims=True)
    label_dis = jnp.where(denom > 0, wl / jnp.where(denom > 0, denom, 1.0),
                          0.0)
    s_masked = jnp.where(m > 0, s, _NEG)
    s_shift = s_masked - jnp.max(s_masked, axis=1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(s_shift), axis=1, keepdims=True))
    log_softmax = s_shift - lse
    return wl, denom, label_dis, log_softmax


def _fwd_kernel(s_ref, y_ref, w_ref, m_ref, out_ref):
    wl, denom, label_dis, log_softmax = _prep(s_ref, y_ref, w_ref, m_ref)
    ce = jnp.sum(-label_dis * log_softmax, axis=1, keepdims=True)
    total = jnp.sum(wl)
    loss = jnp.sum(ce * denom) / jnp.where(total > 0, total, 1.0)
    # Mosaic can't store scalars to VMEM; write the (1, 1) block whole.
    out_ref[...] = loss.reshape(1, 1)


def _bwd_kernel(s_ref, y_ref, w_ref, m_ref, g_ref, ds_ref):
    wl, denom, label_dis, log_softmax = _prep(s_ref, y_ref, w_ref, m_ref)
    total = jnp.sum(wl)
    softmax = jnp.exp(log_softmax)
    scale = denom / jnp.where(total > 0, total, 1.0)
    ds_ref[:] = (g_ref[0] * scale * (softmax - label_dis) * m_ref[:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_loss(s, y, w, m, interpret):
    out = pl.pallas_call(
        _fwd_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(s, y, w, m)
    return out[0, 0]


def _fused_fwd(s, y, w, m, interpret):
    return _fused_loss(s, y, w, m, interpret), (s, y, w, m)


def _fused_bwd(interpret, res, g):
    s, y, w, m = res
    g2 = jnp.full((1,), g, dtype=jnp.float32)
    ds = pl.pallas_call(
        _bwd_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],  # incoming scalar cotangent
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(s.shape, jnp.float32),
        interpret=interpret,
    )(s, y, w, m, g2)
    return ds, None, None, None


_fused_loss.defvjp(_fused_fwd, _fused_bwd)


def fused_softmax_loss(output: jax.Array, labels: jax.Array,
                       propensity_weights: jax.Array = None,
                       mask: jax.Array = None,
                       interpret: bool = None) -> jax.Array:
    """Drop-in fused equivalent of ``ops.losses.softmax_loss`` (labels and
    weights are non-differentiable)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if propensity_weights is None:
        propensity_weights = jnp.ones_like(labels)
    if mask is None:
        mask = jnp.ones_like(labels)
    return _fused_loss(output.astype(jnp.float32),
                       labels.astype(jnp.float32),
                       propensity_weights.astype(jnp.float32),
                       mask.astype(jnp.float32), interpret)
