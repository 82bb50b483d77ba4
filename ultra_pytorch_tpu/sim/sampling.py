"""On-device ranking samplers.

Replaces the reference's per-item numpy Plackett-Luce sampler
(ref ``ultra/input_layer/stochastic_online_simulation_feed.py:129-147``:
``np.random.choice(replace=False, p=softmax(tau * scores))``) with batched
Gumbel-top-k, which draws from exactly the same Plackett-Luce distribution
but as one fused XLA op over the whole batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def plackett_luce_sample(rng: jax.Array, scores: jax.Array,
                         mask: jax.Array = None,
                         tau: float = 1.0) -> jax.Array:
    """Sample rankings without replacement from PL(softmax(tau * scores)).

    Args:
      rng: PRNG key.
      scores: [B, L] ranking scores.
      mask: [B, L] 1 = real doc. Invalid docs are placed after all valid
        docs, preserving their original order (matching the reference's
        "append unselected documents to the end" behavior).
      tau: temperature; higher tau -> closer to deterministic sort.

    Returns:
      [B, L] int32 ranking: position j holds the original index of the doc
      ranked j-th.
    """
    logits = tau * scores
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(rng, scores.shape, minval=1e-20, maxval=1.0)))
    keys = logits + gumbel
    if mask is not None:
        # Invalid docs: strictly below every valid doc, ordered by index.
        tie_break = -jnp.arange(scores.shape[1], dtype=scores.dtype)
        keys = jnp.where(mask > 0, keys, NEG_INF + tie_break)
    return jnp.argsort(-keys, axis=1).astype(jnp.int32)


def deterministic_rank(scores: jax.Array, mask: jax.Array = None) -> jax.Array:
    """Rank docs by score descending (stable), invalid docs last
    (the deterministic online feed's ordering,
    ref ``deterministic_online_simulation_feed.py:129-134``)."""
    keys = scores
    if mask is not None:
        keys = jnp.where(mask > 0, scores, NEG_INF)
    return jnp.argsort(-keys, axis=1, stable=True).astype(jnp.int32)


def rerank(values: jax.Array, ranking: jax.Array) -> jax.Array:
    """Gather [B, L] values into ranked order given [B, L] ranking indices."""
    return jnp.take_along_axis(values, ranking, axis=1)
