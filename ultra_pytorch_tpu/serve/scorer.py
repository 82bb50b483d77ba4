"""Checkpoint-loading batched scorer for online inference.

TPU-first design decisions:

* **Shape buckets, not dynamic shapes.** Every distinct input shape costs
  an XLA compile (minutes through this deployment's remote compile
  service), so requests are padded up to power-of-two (batch, list-size)
  buckets: at most ``O(log B * log L)`` compiled programs ever, and a
  warmed bucket serves any smaller request instantly.
* **One fused program per request.** Scoring + pad-masking + per-query
  ranking (argsort of masked scores) run inside a single jit so only the
  final ranked indices/scores leave the device.
* **Full-state checkpoints carry their own schema.** ``Experiment.save``
  records the ranker class/hparams and feature size in the checkpoint
  metadata, so ``Scorer.from_checkpoint(model_dir)`` needs no settings
  file (one can still be passed to override).

The reference has no serving path (its closest surface is
``main.py --test_only``, ref ``main.py:216-257``, which re-reads a whole
dataset from disk); this module is new capability.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ultra_pytorch_tpu.utils import checkpoint as ckpt_lib

_NEG_INF = -1e30


def _bucket(n: int, floor: int) -> int:
    """Smallest power-of-two >= n (at least `floor`)."""
    b = floor
    while b < n:
        b *= 2
    return b


def _find_ckpt(path: str) -> str:
    """Resolve a model dir or ckpt path to the ``<path>.ckpt`` stem."""
    if path.endswith(".ckpt"):
        return path
    if path.endswith(".ckpt.npz"):
        return path[: -len(".npz")]
    hits = sorted(glob.glob(os.path.join(path, "*.ckpt.npz")))
    if not hits:
        raise FileNotFoundError(f"no *.ckpt.npz checkpoint under {path}")
    if len(hits) > 1:
        raise ValueError(
            f"multiple checkpoints under {path}: {hits}; pass the .ckpt")
    return hits[0][: -len(".npz")]


class Scorer:
    """Batched ranking inference over a trained ranker."""

    def __init__(self, ranker, params, feature_size: int,
                 min_batch_bucket: int = 8, min_list_bucket: int = 8):
        self.ranker = ranker
        self.params = params
        self.feature_size = int(feature_size)
        self.min_batch_bucket = min_batch_bucket
        self.min_list_bucket = min_list_bucket
        self._compiled: Dict[Any, Any] = {}

    # -- construction -----------------------------------------------------
    @classmethod
    def from_checkpoint(cls, path: str,
                        exp_settings: Optional[Dict[str, Any]] = None,
                        feature_size: Optional[int] = None,
                        max_label: Optional[float] = None,
                        use_pallas: Optional[bool] = None,
                        **kwargs) -> "Scorer":
        """Load a trained ``Experiment`` checkpoint for serving.

        Args:
          path: model dir, ``<algo>.ckpt`` stem, or ``.ckpt.npz`` file.
          exp_settings: experiment-settings dict (reference schema). Only
            needed for pre-r2 checkpoints without embedded serve metadata;
            when given it overrides the embedded settings.
          feature_size / max_label: likewise only needed as fallbacks.
          use_pallas: run the DNN ranker through the fused Pallas scoring
            kernel (ops/pallas/mlp.py). Training keeps it off — the
            scan-fused train step leaves the kernel nothing to win
            (BASELINE.md kernel table) — but the serving path IS the
            standalone forward where the kernel wins at every measured
            shape on the v5e chip (tools/bench_serve.py). Default None =
            auto: on for the DNN ranker on TPU, off elsewhere.
        """
        from ultra_pytorch_tpu.run.experiment import create_algorithm

        ckpt = _find_ckpt(path)
        meta = ckpt_lib.read_metadata(ckpt)
        serve_meta = meta.get("serve", {})
        settings = dict(serve_meta.get("exp_settings", {}))
        settings.update(exp_settings or {})
        if feature_size is None:
            feature_size = serve_meta.get("feature_size")
        if feature_size is None:
            raise ValueError(
                f"{ckpt} predates serve metadata; pass feature_size= and "
                "exp_settings= explicitly")
        if max_label is None:
            max_label = serve_meta.get("max_label", 1.0)
        for key in ("ranking_model", "learning_algorithm"):
            if key not in settings:
                raise ValueError(
                    f"cannot rebuild the ranker: '{key}' neither embedded "
                    f"in {ckpt} metadata nor passed via exp_settings")
        is_dnn = settings["ranking_model"].rsplit(".", 1)[-1] == "DNN"
        if use_pallas is None:
            # Auto: the fused kernel wins at every measured serving shape
            # on real TPU hardware (BASELINE.md serving table) but only
            # exists for the DNN ranker; interpret mode off-TPU would be
            # a slowdown, not a win.
            use_pallas = is_dnn and jax.default_backend() == "tpu"
        if use_pallas:
            if not is_dnn:
                raise ValueError("use_pallas serving requires the DNN "
                                 f"ranker, got {settings['ranking_model']}")
            hp = settings.get("ranking_model_hparams", "")
            settings["ranking_model_hparams"] = (
                (hp + "," if hp else "") + "use_pallas=true")

        alg = create_algorithm(settings, int(feature_size), float(max_label))
        template_state = alg.init_state(jax.random.PRNGKey(0),
                                        int(feature_size))
        # The data-RNG leaf's shape depends on the PRNG impl the trainer
        # ran with (threefry (2,) vs rbg (4,)); serving discards it.
        rng_shape = {"rbg": (4,)}.get(meta.get("prng_impl"), (2,))
        template = (template_state, np.zeros(rng_shape, np.uint32))
        (state, _), _ = ckpt_lib.load_checkpoint(ckpt, template=template)
        return cls(alg.ranker, state.params, int(feature_size), **kwargs)

    # -- inference --------------------------------------------------------
    def _ranked_fn(self, b: int, length: int):
        key = (b, length)
        if key not in self._compiled:
            ranker = self.ranker

            @jax.jit
            def ranked(params, features, mask):
                scores = ranker.apply(params, features, mask,
                                      is_training=False)
                masked = jnp.where(mask > 0, scores, _NEG_INF)
                order = jnp.argsort(-masked, axis=1, stable=True)
                return masked, order

            self._compiled[key] = ranked
        return self._compiled[key]

    def _pad(self, features: np.ndarray, n_valid: np.ndarray):
        q, length, f = features.shape
        if f != self.feature_size:
            raise ValueError(
                f"feature size {f} != model feature size {self.feature_size}")
        bq = _bucket(q, self.min_batch_bucket)
        bl = _bucket(length, self.min_list_bucket)
        padded = np.zeros((bq, bl, f), np.float32)
        padded[:q, :length] = features
        mask = (np.arange(bl)[None, :]
                < np.concatenate([n_valid, np.zeros(bq - q)])[:, None])
        return padded, mask.astype(np.float32), (q, length)

    def score(self, features: np.ndarray,
              n_valid: Optional[Sequence[int]] = None) -> np.ndarray:
        """Scores for ``[Q, L, F]`` candidate lists -> ``[Q, L]`` float32.

        Positions beyond each query's ``n_valid`` get ``-1e30``.
        """
        scores, _ = self._score_ranked(features, n_valid)
        return scores

    def rank(self, features: np.ndarray,
             n_valid: Optional[Sequence[int]] = None) -> np.ndarray:
        """Ranked candidate indices (best first) for each query ``[Q, L]``.

        Invalid (padded) positions sort to the tail.
        """
        _, order = self._score_ranked(features, n_valid)
        return order

    def _score_ranked(self, features, n_valid):
        features = np.asarray(features, np.float32)
        if features.ndim == 2:
            features = features[None]
        q, length, _ = features.shape
        n_valid = (np.full(q, length, np.int32) if n_valid is None
                   else np.asarray(n_valid, np.int32))
        padded, mask, (q, length) = self._pad(features, n_valid)
        fn = self._ranked_fn(*padded.shape[:2])
        scores, order = fn(self.params, jnp.asarray(padded),
                           jnp.asarray(mask))
        scores = np.asarray(scores)[:q, :length]
        order = np.asarray(order)[:q]
        # Keep only in-range candidate indices per query, in ranked order.
        keep = order < length
        order = order[keep].reshape(q, length)
        return scores, order

    def warmup(self, max_batch: int, max_list_size: int) -> None:
        """Pre-compile every bucket up to the given maxima."""
        b = self.min_batch_bucket
        while True:
            li = self.min_list_bucket
            while True:
                feats = np.zeros((b, li, self.feature_size), np.float32)
                self.score(feats)
                if li >= max_list_size:
                    break
                li *= 2
            if b >= max_batch:
                break
            b *= 2
