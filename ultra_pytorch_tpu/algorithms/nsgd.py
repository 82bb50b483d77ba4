"""Null Space Gradient Descent (NSGD).

Capability parity with ref ``ultra/learning_algorithm/nsgd.py`` (Wang et
al. SIGIR'18): MGD whose exploration noise is sampled from the NULL SPACE
of recently losing noise directions:

  * per linear parameter, the memory holds ``ranker_num`` bad (losing)
    noise tensors from the previous step (ref ``bad_noisy_params``
    ``:92-103``, overwritten each step from the non-winners,
    ref ``:258-275``);
  * the null space is the set of right-singular vectors of the stacked bad
    noises whose singular value is (numerically) zero
    (ref ``compute_null_space`` ``:291-298``); exploration noise is a
    normalized random combination of those directions
    (ref ``sample_from_null_space`` ``:279-288``).

The SVD runs inside the jitted step via ``jnp.linalg.svd``. The bad-noise
memory lives in TrainState.aux (the reference keeps it as a Python attr
lost on checkpoint). Divergence: the reference tests ``s == 0`` exactly,
which in float only matches the all-zero init; we use a small tolerance so
genuinely-losing directions are actually excluded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.algorithms.dbgd import DBGD
from ultra_pytorch_tpu.models import base as model_base
from ultra_pytorch_tpu.utils.registry import register

_SV_TOL = 1e-6


@register("algorithm", "NSGD", aliases=["ultra.learning_algorithm.NSGD"])
class NSGD(DBGD):

    name = "nsgd"

    def default_hparams(self):
        hp = super().default_hparams()
        hp.update({"ranker_num": 4})
        return hp

    def init_state(self, rng, feature_size):
        state = super().init_state(rng, feature_size)
        R = self.ranker_num
        bad = jax.tree_util.tree_map(
            lambda p: jnp.zeros((R,) + p.shape, p.dtype), state.params)
        return state.replace(aux={"bad_noise": bad})

    # -- null-space sampling ----------------------------------------------
    def _null_space_sample(self, rng, bad_leaf, spec_leaf):
        """Sample one normalized noise leaf from the null space of the
        stacked bad noises (ref :279-298)."""
        R = bad_leaf.shape[0]
        shape = bad_leaf.shape[1:]
        size = 1
        for s in shape:
            size *= s
        n = jax.random.normal(rng, (R,))
        if size <= 1:
            vec = jax.random.normal(rng, shape)
        else:
            matrix = bad_leaf.reshape(R, size)             # [R, D]
            u, s, vh = jnp.linalg.svd(matrix, full_matrices=False)
            mask = (s <= _SV_TOL).astype(matrix.dtype)     # null directions
            null_basis = vh.T * mask[None, :]              # [D, R]
            vec = (null_basis @ n).reshape(shape)
        norm = jnp.sqrt(jnp.maximum(jnp.sum(vec ** 2), 1e-12))
        return (vec / norm) * spec_leaf

    def _sample_noises_with_state(self, rng, state):
        spec = model_base.noise_spec(state.params)
        bad = state.aux["bad_noise"]
        noises = []
        for r in range(self.ranker_num):
            leaves, treedef = jax.tree_util.tree_flatten(bad)
            spec_leaves = jax.tree_util.tree_leaves(spec)
            keys = jax.random.split(jax.random.fold_in(rng, r), len(leaves))
            noise_leaves = [
                self._null_space_sample(k, b, sp)
                for k, b, sp in zip(keys, leaves, spec_leaves)
            ]
            noises.append(jax.tree_util.tree_unflatten(treedef, noise_leaves))
        return noises

    # -- bad-noise memory update (ref :258-275) ----------------------------
    def _update_aux(self, state, noises, win_totals):
        loser = (win_totals[1:] == 0).astype(jnp.float32)  # [R]

        def update_leaf(bad_leaf, *noise_leaves):
            stacked = jnp.stack(noise_leaves)              # [R, ...]
            flags = loser.reshape((-1,) + (1,) * (stacked.ndim - 1))
            return stacked * flags

        bad = jax.tree_util.tree_map(
            update_leaf, state.aux["bad_noise"], *noises)
        return {"bad_noise": bad}
