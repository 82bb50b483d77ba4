"""Team-draft multileaving, vectorized for TPU.

Behavioral parity with the reference's sequential numpy implementation
(ref ``ultra/utils/team_draft_interleave.py:14-53``):

  * a common prefix shared by every input ranking is emitted first with no
    team credit (teams = -1),
  * thereafter rankers draft in randomly shuffled rounds of ``n_rankers``,
    each contributing its highest-ranked not-yet-used document,
  * clicks are credited to the drafting team and winners are the per-ranker
    click shares (``infer_winner``, ref ``:48-53``).

The draft loop is a ``lax.scan`` over output positions with a used-doc mask
carried per item; the whole batch is interleaved in one jitted call
(``vmap`` over items), so the DBGD family never leaves the device to
multileave.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _draft_one(rankings: jax.Array, assignment: jax.Array):
    """Interleave one item.

    Args:
      rankings: [R, L] int32, each row a permutation of 0..L-1 (doc slots).
      assignment: [L] int32 drafting order (pre-shuffled rounds of rankers).

    Returns:
      (multileaved [L] int32, teams [L] int32 with -1 for common prefix)
    """
    R, L = rankings.shape

    # Common-prefix length: leading positions where all rankers agree.
    agree = jnp.all(rankings == rankings[0:1], axis=0)          # [L]
    prefix_len = jnp.argmin(jnp.concatenate(
        [agree, jnp.array([False])]).astype(jnp.int32))

    pos_idx = jnp.arange(L)

    def step(carry, m):
        used, ptrs = carry                                       # [L], [R]
        in_prefix = m < prefix_len
        team = jnp.where(in_prefix, 0, assignment[m])
        row = rankings[team]                                     # [L]
        # First index >= ptr whose doc is unused.
        cand = (pos_idx >= ptrs[team]) & ~used[row]
        j = jnp.argmax(cand)
        drafted = row[j]
        doc = jnp.where(in_prefix, rankings[0, m], drafted)
        used = used.at[doc].set(True)
        ptrs = jnp.where(in_prefix, ptrs,
                         ptrs.at[team].set(j + 1))
        ptrs = jnp.where(in_prefix, jnp.maximum(ptrs, m + 1), ptrs)
        team_out = jnp.where(in_prefix, -1, team)
        return (used, ptrs), (doc, team_out)

    used0 = jnp.zeros((L,), dtype=bool)
    ptrs0 = jnp.zeros((R,), dtype=jnp.int32)
    _, (multileaved, teams) = jax.lax.scan(step, (used0, ptrs0), pos_idx)
    return multileaved.astype(jnp.int32), teams.astype(jnp.int32)


def _round_assignments(rng: jax.Array, n_rankers: int, length: int):
    """Drafting order: independent random permutations of the rankers,
    concatenated (ref ``team_draft_interleave.py:30-34``)."""
    rounds = -(-length // n_rankers) + 1
    keys = jax.random.split(rng, rounds)
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, n_rankers))(keys)    # [rounds, R]
    return perms.reshape(-1)[:length].astype(jnp.int32)


def team_draft_interleave(rng: jax.Array, rankings: jax.Array):
    """Multileave a batch of ranking sets.

    Args:
      rng: PRNG key.
      rankings: [B, R, L] int32 — R rankings (permutations of doc slots) per
        item.

    Returns:
      multileaved: [B, L] int32 doc slots in interleaved order.
      teams: [B, L] int32 drafting team per position (-1 = shared prefix).
    """
    B, R, L = rankings.shape
    keys = jax.random.split(rng, B)
    assignments = jax.vmap(
        lambda k: _round_assignments(k, R, L))(keys)             # [B, L]
    return jax.vmap(_draft_one)(rankings, assignments)


def infer_winners(teams: jax.Array, clicks: jax.Array,
                  n_rankers: int) -> jax.Array:
    """Per-ranker click share (ref ``team_draft_interleave.py:48-53``).

    Args:
      teams: [B, L] team assignment from `team_draft_interleave`.
      clicks: [B, L] click indicators on the multileaved list.
      n_rankers: number of rankers R.

    Returns:
      [B, R] click share per ranker (sums to <= 1 per item).
    """
    team_ids = jnp.arange(n_rankers)[None, :, None]              # [1, R, 1]
    credit = (teams[:, None, :] == team_ids) * clicks[:, None, :]
    ranker_clicks = credit.sum(axis=2)                           # [B, R]
    return ranker_clicks / (ranker_clicks.sum(axis=1, keepdims=True) + 1e-7)
