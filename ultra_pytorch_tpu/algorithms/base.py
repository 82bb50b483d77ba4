"""Learning-algorithm protocol: ``(init_state, train_step, score)`` triples.

Replaces the reference's stateful ``BaseAlgorithm`` OO protocol
(ref ``ultra/learning_algorithm/base_algorithm.py:32-87``: mutable
``self.loss``/``self.labels``, per-step feed dicts, in-place optimizers) with
pure functions over a single :class:`TrainState` pytree:

  * ``init_state(rng, feature_size)``      -> TrainState
  * ``train_step(state, batch, rng)``      -> (TrainState, metrics dict)
  * ``score(state, batch)``                -> [B, L] ranking scores

``train_step`` is jitted (and sharded by ``parallel/``) as one XLA program.
ALL auxiliary algorithm state — DLA's propensity tower, Regression-EM's
propensity vector, PairwiseDebias' t+/t-, NSGD's bad-noise memory — lives in
``TrainState.aux`` so checkpoints capture the complete training state (the
reference loses everything but the ranker on resume, ref ``main.py:198-214``).

Common boilerplate the reference repeats per algorithm (hparams parse, cuda
detection, optimizer select, validation metric block — e.g. ``dla.py:268-285``
vs ``navie_algorithm.py:122-149``) is centralized here.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ultra_pytorch_tpu.metrics import ranking as metrics_lib
from ultra_pytorch_tpu.ops import losses
from ultra_pytorch_tpu.utils.hparams import HParams

PADDING_SCORE = metrics_lib.PADDING_SCORE


@struct.dataclass
class TrainState:
    params: Any                 # ranker params pytree
    opt_state: Any
    aux: Any                    # algorithm-specific state pytree (or None)
    step: jax.Array             # scalar int32


def adagrad_torch(learning_rate: float,
                  initial_accumulator_value: float = 0.0,
                  eps: float = 1e-10) -> optax.GradientTransformation:
    """Adagrad with torch's exact denominator placement.

    ``optax.adagrad`` computes ``g * rsqrt(accum + eps)`` (eps inside the
    root) while ``torch.optim.Adagrad`` computes ``g / (sqrt(accum) + eps)``
    (eps outside). The two differ materially for the FIRST steps of
    small-gradient parameters: at ``accum = g^2`` torch's update is a full
    ``±lr`` regardless of |g|, while eps-inside attenuates anything with
    ``|g| < sqrt(eps)``. Adagrad's accumulator freezes those early-step
    differences into the whole trajectory, which showed up as an at-scale
    quality gap for the prs-weighted loss (BASELINE.md PRSrank note); this
    transform makes the update rule bit-compatible with the reference's
    optimizer (ref ``prs_rank.py:91``, torch ``_single_tensor_adagrad``)."""

    def init_fn(params):
        return optax.ScaleByRssState(
            sum_of_squares=jax.tree.map(
                lambda p: jnp.full_like(p, initial_accumulator_value),
                params))

    def update_fn(updates, state, params=None):
        del params
        sum_of_squares = jax.tree.map(
            lambda g, t: t + jnp.square(g), updates, state.sum_of_squares)
        updates = jax.tree.map(
            lambda g, t: -learning_rate * g / (jnp.sqrt(t) + eps),
            updates, sum_of_squares)
        return updates, optax.ScaleByRssState(sum_of_squares=sum_of_squares)

    return optax.GradientTransformation(init_fn, update_fn)


def adagrad_reset(learning_rate: float,
                  initial_accumulator_value: float = 0.0,
                  eps: float = 1e-10) -> optax.GradientTransformation:
    """Adagrad whose accumulator resets EVERY step — the reference DLA's
    de-facto optimizer.

    The reference's ``DLA.separate_gradient_update`` instantiates a fresh
    ``torch.optim.Adagrad`` each call (``self.optimizer_func`` holds the
    CLASS, not an instance — ref ``dla.py:127,153-154``; every other
    reference algorithm builds its optimizer once in ``__init__``). A fresh
    torch optimizer has an empty state dict, so each step's accumulator is
    just ``g^2`` and the update collapses to
    ``-lr * g / (|g| + eps) ~= -lr * sign(g)`` — constant-magnitude sign
    steps, not Adagrad. That behavior explains the reference DLA's training
    dynamics at scale: fast early progress (steps never decay) and its
    documented divergence under the PBM 10k-iteration protocol (constant
    steps cannot anneal; BASELINE.md). Exposed as
    ``grad_strategy=ada_reset`` so the reference's exact DLA dynamics can
    be reproduced/compared; the default ``ada`` keeps true Adagrad."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree.map(
            lambda g: -learning_rate * g / (
                jnp.sqrt(initial_accumulator_value + jnp.square(g)) + eps),
            updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(grad_strategy: str, learning_rate: float,
                   max_gradient_norm: float) -> optax.GradientTransformation:
    """Optimizer select (ref per-algo ``grad_strategy`` 'ada'|'sgd', e.g.
    ``dla.py:127-129``) with torch-exact Adagrad (see :func:`adagrad_torch`)
    and the reference's clip-by-global-norm
    (ref ``base_algorithm.py:223-225``). ``ada_reset`` reproduces the
    reference DLA's per-step optimizer re-instantiation (see
    :func:`adagrad_reset`)."""
    if grad_strategy == "sgd":
        opt = optax.sgd(learning_rate)
    elif grad_strategy == "ada_reset":
        opt = adagrad_reset(learning_rate)
    else:
        opt = adagrad_torch(learning_rate)
    if max_gradient_norm and max_gradient_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(max_gradient_norm), opt)
    # One flat vector instead of per-leaf ops: clip's global norm and the
    # Adagrad update become ~3 fused kernels instead of ~3 per pytree
    # leaf — measurable at a ~190us step where per-op issue overhead
    # counts (BASELINE.md r4). Numerically equivalent, NOT bit-identical:
    # flattening changes clip_by_global_norm's sum-of-squares reduction
    # order (one concatenated vector vs per-leaf partials), and first-step
    # Adagrad is +/-lr*sign(g), so float-noise sign flips can diverge
    # trajectories across builds (expected; both sides of the r4 replay
    # harness show the same chaos).
    return optax.flatten(opt)


class BaseAlgorithm:
    """Shared construction + eval logic for all learning algorithms."""

    name = "base"

    def __init__(self, ranker, exp_settings: Dict[str, Any],
                 max_label: float = 1.0):
        """Args:
          ranker: a models.BaseRanker instance.
          exp_settings: experiment dict (same schema as the reference's,
            ref ``example/offline_setting/*.json`` + runtime-injected
            ``max_candidate_num`` / ``selection_bias_cutoff``).
        """
        self.ranker = ranker
        self.exp_settings = exp_settings
        self.max_label = max_label
        self.max_candidate_num = exp_settings["max_candidate_num"]
        self.rank_list_size = exp_settings.get(
            "selection_bias_cutoff", self.max_candidate_num)
        self.hparams = HParams(**self.default_hparams())
        self.hparams.parse(exp_settings.get("learning_algorithm_hparams", ""))
        self.loss_fn = losses.LOSS_FUNCTIONS.get(
            self.hparams.get("loss_func", "softmax_loss"),
            losses.softmax_loss)
        # Cross-replica reducer bound by parallel.make_dp_train_step; applied
        # to gradients AND batch-statistic state updates (REM / PD / etc.).
        self.grad_sync = None
        # Per-shard rng folder bound by parallel.make_dp_train_step. The rng
        # passed to train_step is REPLICA-IDENTICAL under data parallelism;
        # algorithms route any per-example randomness (REM's Bernoulli
        # E-step, DBGD-family click simulation) through per_shard_rng so
        # shards draw independently, while replica-shared randomness (the
        # DBGD family's candidate noise directions) uses the rng directly —
        # keeping aux state like NSGD's bad-noise memory replica-identical.
        self.shard_rng = None

    # -- to override ------------------------------------------------------
    def default_hparams(self) -> Dict[str, Any]:
        return {
            "learning_rate": 0.05,
            "max_gradient_norm": 5.0,
            "loss_func": "softmax_loss",
            "l2_loss": 0.0,
            "grad_strategy": "ada",
        }

    def init_state(self, rng: jax.Array, feature_size: int) -> TrainState:
        params = self.ranker.init(rng, feature_size)
        opt = self.optimizer()
        return TrainState(params=params, opt_state=opt.init(params),
                          aux=None, step=jnp.zeros((), jnp.int32))

    def train_step(self, state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        raise NotImplementedError

    # -- shared helpers ---------------------------------------------------
    def optimizer(self) -> optax.GradientTransformation:
        return make_optimizer(self.hparams.get("grad_strategy", "ada"),
                              float(self.hparams.get("learning_rate", 0.05)),
                              float(self.hparams.get("max_gradient_norm", 5.0)))

    def score(self, state: TrainState, batch: Dict[str, jax.Array]
              ) -> jax.Array:
        """Eval-mode scoring of a full candidate list."""
        return self.ranker.apply(state.params, batch["features"],
                                 batch.get("mask"), is_training=False)

    def score_with_params(self, params, batch: Dict[str, jax.Array],
                          is_training: bool = True,
                          rng: Optional[jax.Array] = None) -> jax.Array:
        """Training-mode scoring. `rng` enables the ranker's stochastic
        regularization (SetRank dropout); rankers with none ignore it."""
        return self.ranker.apply(params, batch["features"],
                                 batch.get("mask"), rng=rng,
                                 is_training=is_training)

    def dropout_rng(self, rng: jax.Array) -> jax.Array:
        """Per-shard key for training-time ranker stochasticity, derived by
        folding a fixed tag into the step rng so callers keep their
        existing split structure unchanged."""
        return self.per_shard_rng(jax.random.fold_in(rng, 0x5E7A))

    def validation_metrics(self, state: TrainState,
                           batch: Dict[str, jax.Array],
                           rng: Optional[jax.Array] = None
                           ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Scores + the experiment's `metrics x metrics_topn` summary
        (the block every reference algorithm repeats,
        e.g. ``dla.py:268-285``).

        With ``rng``, TIED scores are randomly ordered before metric
        computation — the reference's shuffle_ties behavior (ref
        ``metric_utils.py:49-85``); the driver passes a key derived from
        (seed, train step), so runs stay reproducible while untrained /
        degenerate rankers are no longer scored in initial-list order."""
        output = self.score(state, batch)
        summary = metrics_lib.evaluate(
            batch["labels"], output,
            self.exp_settings.get("metrics", ["mrr", "ndcg"]),
            self.exp_settings.get("metrics_topn", [3, 5, 10]),
            max_label=self.max_label, mask=batch.get("mask"), rng=rng)
        return output, summary

    def l2_penalty(self, params) -> jax.Array:
        l2 = float(self.hparams.get("l2_loss", 0.0))
        if l2 > 0:
            return l2 * losses.l2_loss(params)
        return jnp.zeros(())

    def sync(self, tree):
        """Cross-replica mean under data parallelism; identity otherwise."""
        if self.grad_sync is not None:
            return self.grad_sync(tree)
        return tree

    def online_reward_metric(self, batch: Dict[str, jax.Array]
                             ) -> Optional[Dict[str, jax.Array]]:
        """Per-step online metrics of the SHOWN list, when the batch came
        from an online simulation feed (marker: the feed attaches ranked
        true labels under "relevance"; offline/supervised batches have no
        shown-list semantics):

          * ``online_reward`` — mean clicks the simulated user gave the
            shown list (the raw bandit feedback);
          * ``online_ndcg`` — nDCG@cutoff of the shown ordering against
            TRUE relevance — the cumulative online-performance axis of
            the online-LTR literature (what the user actually
            experienced while the bandit explored).

        Both are free to compute since simulation is fused on-device
        (VERDICT r2 #8)."""
        if "relevance" not in batch:
            return None
        L = self.rank_list_size
        mask = batch["mask"][:, :L]
        clicks = batch["labels"][:, :L] * mask
        # The shown order IS the batch order (the feed already reranked),
        # so score positions descending to evaluate the shown list as-is.
        shown_scores = metrics_lib.mask_padding(
            -jnp.broadcast_to(jnp.arange(L, dtype=jnp.float32),
                              mask.shape), mask)
        ndcg = metrics_lib.normalized_discounted_cumulative_gain(
            batch["relevance"][:, :L] * mask, shown_scores, None, [L])[0]
        return {"online_reward": self.sync(jnp.mean(clicks.sum(axis=1))),
                "online_ndcg": self.sync(ndcg)}

    def per_shard_rng(self, key: jax.Array) -> jax.Array:
        """Fold the shard index into `key` under data parallelism (identity
        on a single device) — see the shard_rng convention above."""
        if self.shard_rng is not None:
            return self.shard_rng(key)
        return key

    def apply_updates(self, opt, params, opt_state, grads):
        grads = self.sync(grads)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state

    def train_slice(self, batch: Dict[str, jax.Array]
                    ) -> Dict[str, jax.Array]:
        """Cut a batch to the top-``rank_list_size`` training list
        (the reference's selection_bias_cutoff slicing,
        ref ``base_algorithm.py:130-131``)."""
        L = self.rank_list_size
        if batch["labels"].shape[1] <= L:
            return batch
        return {k: (v[:, :L] if v.ndim >= 2 else v)
                for k, v in batch.items()}
