"""On-chip PBM click sampling (Pallas/TPU, hardware PRNG).

Click simulation with the position-biased model is one Bernoulli draw per
(item, position): ``click = U < exam(pos)^eta * click_prob[grade]``
(ref ``ultra/utils/click_models.py:99-107``). This kernel draws the uniform
variates with the TPU's per-core PRNG (``pltpu.prng_random_bits``) and
emits clicks for a whole [B, L] batch without any HBM round-trip for the
randomness — synthetic feedback never leaves the chip.

The regular jnp sampler in ``sim/click_models.py`` remains the reference
implementation (and supports UBM/cascade); this kernel is the PBM fast
path, validated statistically against it on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n_seed_words, seed_ref, probs_ref, mask_ref, out_ref):
    # Seed with EVERY word of the jax key (2 for threefry, 4 for rbg):
    # a single 31-bit seed would collapse each batch's click pattern into
    # a 2^31 space and collide (birthday bound) within ~77k kernel calls.
    pltpu.prng_seed(*(seed_ref[i] for i in range(n_seed_words)))
    probs = probs_ref[:]
    # uniform in [0, 1) from 24 high bits (float32-exact). The raw bits
    # come back as SIGNED int32 — bitcast to uint32 first, or the shift
    # is arithmetic and half the draws go negative (always "click").
    bits = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits(probs.shape), jnp.uint32)
    # Mosaic has no uint32->f32 cast; the top-24-bit value fits int32.
    hi = jax.lax.bitcast_convert_type(bits >> 8, jnp.int32)
    u = hi.astype(jnp.float32) * (1.0 / (1 << 24))
    out_ref[:] = (u < probs).astype(jnp.float32) * mask_ref[:]


def pallas_sample_pbm_clicks(model_params, rng: jax.Array,
                             labels: jax.Array, mask: jax.Array = None,
                             interpret: bool = None) -> jax.Array:
    """PBM clicks [B, L] using the on-chip PRNG.

    `model_params` is a sim.click_models.ClickModelParams (PBM only).
    """
    if interpret is None:
        interpret = False
    if not interpret and jax.default_backend() != "tpu":
        # The hardware-PRNG primitives (pltpu.prng_seed/prng_random_bits)
        # have no interpret or non-TPU lowering; fail with a clear message
        # instead of a Mosaic lowering error. Product callers
        # (input_layer/feeds.py) gate on the backend and fall back to the
        # jnp sampler.
        raise NotImplementedError(
            "pallas_sample_pbm_clicks requires a TPU backend "
            "(hardware PRNG); use sim.click_models.sample_clicks off-TPU")
    if mask is None:
        mask = jnp.ones_like(labels)
    L = labels.shape[1]
    exam_table = model_params.exam_prob ** model_params.eta
    pos = jnp.minimum(jnp.arange(L), exam_table.shape[0] - 1)
    exam = exam_table[pos][None, :]                        # [1, L]
    grades = jnp.clip(labels.astype(jnp.int32), 0,
                      model_params.click_prob.shape[0] - 1)
    click_p = model_params.click_prob[grades]              # [B, L]
    probs = exam * click_p
    kd = rng if jnp.issubdtype(rng.dtype, jnp.unsignedinteger) \
        else jax.random.key_data(rng)
    seed = jax.lax.bitcast_convert_type(kd.reshape(-1), jnp.int32)
    return pl.pallas_call(
        functools.partial(_kernel, seed.shape[0]),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(labels.shape, jnp.float32),
        interpret=interpret,
    )(seed, probs.astype(jnp.float32), mask.astype(jnp.float32))
