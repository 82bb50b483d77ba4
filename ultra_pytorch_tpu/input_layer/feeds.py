"""Input feeds: pure on-device batch builders.

Capability parity with ref ``ultra/input_layer/`` (BaseInputFeed +
ClickSimulationFeed + Deterministic/StochasticOnlineSimulationFeed +
DirectLabelFeed), re-architected for TPU:

  * the reference assembles feed dicts on the host with numpy every step
    (ref ``click_simulation_feed.py:122-163``) and the *online* feeds invert
    control by calling back up into the algorithm
    (``model.validation(input_feed, True)``,
    ref ``stochastic_online_simulation_feed.py:100-113``);
  * here every feed exposes ``train_batch(rng, state, dataset) -> batch``
    — a pure jittable function over the device-resident dataset (a pytree
    passed as a jit ARGUMENT, so the feature table is never embedded in
    the compiled program), where ``state`` is the algorithm TrainState
    (online feeds score with the CURRENT ranker inside the same XLA
    program; SURVEY.md §3.4's inversion).

Batch layout: ``{"features": [B, L, F], "labels": [B, L], "mask": [B, L],
"initial_scores": [B, L]}``; for click feeds ``labels`` are sampled clicks.

Rejection-resampling semantics (ref resample-until-click loops,
``click_simulation_feed.py:89-91``, ``stochastic_...py:162-169``) become
fixed-K batched resampling: K rounds of fresh draws keep the first valid
sample; lists still clickless after K rounds are masked out of the loss
(documented divergence — no data-dependent while loops under jit).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ultra_pytorch_tpu.data.dataset import DeviceDataset
from ultra_pytorch_tpu.sim import click_models as cm
from ultra_pytorch_tpu.sim.sampling import (
    deterministic_rank, plackett_luce_sample, rerank)
from ultra_pytorch_tpu.utils.hparams import HParams
from ultra_pytorch_tpu.utils.registry import register

Batch = Dict[str, jax.Array]


def _take(dev: DeviceDataset, qs: jax.Array) -> Batch:
    return dev.gather(qs)


class BaseInputFeed:
    """Shared feed plumbing (ref ``base_input_feed.py:10-93``)."""

    MAX_SAMPLE_ROUND_NUM = 100

    def __init__(self, algorithm, batch_size: int, hparam_str: str,
                 dataset: DeviceDataset, list_size: Optional[int] = None):
        self.algorithm = algorithm
        self.batch_size = batch_size
        self.dataset = dataset
        self.list_size = list_size or dataset.list_size
        self.rank_list_size = getattr(
            algorithm, "rank_list_size", self.list_size)
        self.hparams = HParams(**self.default_hparams())
        self.hparams.parse(hparam_str or "")

    def default_hparams(self) -> Dict[str, Any]:
        return {}

    @staticmethod
    def preprocess_data(data_set, hparam_str, exp_settings):
        """Static preprocessing hook (no-op, ref ``base_input_feed.py:17-26``)."""
        return data_set

    # -- training ---------------------------------------------------------
    def train_batch(self, rng: jax.Array, state,
                    dataset: Optional[DeviceDataset] = None) -> Batch:
        """Build one training batch. Under jit, pass `dataset` EXPLICITLY
        (it is a pytree) — relying on the `self.dataset` fallback from
        inside a traced function closure-captures the arrays and embeds
        the whole feature table as an HLO constant."""
        raise NotImplementedError

    # -- window planning ---------------------------------------------------
    def can_plan(self) -> bool:
        """True when this feed implements the hoisted window plan. The
        single place callers (Experiment, make_dp_train_step, the bench
        harness) decide between the planned and per-step scan bodies."""
        return (type(self).train_batch_plan
                is not BaseInputFeed.train_batch_plan)

    def train_batch_plan(self, rng: jax.Array, state, dataset, n: int):
        """Optionally precompute n steps of (query, label) draws as ONE
        batched program, hoisted out of the per-step scan body.

        Returns a pytree plan consumed by :meth:`batch_from_plan`, or None
        when the feed cannot plan ahead (online feeds score with the
        CURRENT ranker, which changes every step). Feeds that can plan
        turn ~15 small sequential ops per scan step into one batched
        op-set per window — per-op issue overhead is a real share of a
        ~190us step (BASELINE.md r4). Feature gathers stay in the step
        body (hoisting them would round-trip the window's [n,B,L,F]
        features through HBM for no fusion benefit)."""
        return None

    def batch_from_plan(self, plan, i, dataset) -> Batch:
        raise NotImplementedError

    # -- evaluation -------------------------------------------------------
    def eval_batches(self, rng: Optional[jax.Array] = None
                     ) -> Iterator[Tuple[Batch, int, int]]:
        """Sequential batches over the whole dataset (ref get_next_batch).
        Yields (batch, start_index, count)."""
        q = self.dataset.num_queries
        for start in range(0, q, self.batch_size):
            count = min(self.batch_size, q - start)
            qs = jnp.arange(start, start + count)
            yield _take(self.dataset, qs), start, count


@register("feed", "DirectLabelFeed",
          aliases=["ultra.input_layer.DirectLabelFeed"])
class DirectLabelFeed(BaseInputFeed):
    """Feed true relevance labels (ref ``direct_label_feed.py:22-284``)."""

    def default_hparams(self):
        return {"use_max_candidate_num": True}

    def train_batch(self, rng: jax.Array, state,
                    dataset: Optional[DeviceDataset] = None) -> Batch:
        ds = dataset if dataset is not None else self.dataset
        qs = jax.random.randint(rng, (self.batch_size,), 0, ds.num_queries)
        return _take(ds, qs)

    def train_batch_plan(self, rng: jax.Array, state, dataset, n: int):
        ds = dataset if dataset is not None else self.dataset
        return jax.random.randint(rng, (n, self.batch_size), 0,
                                  ds.num_queries)

    def batch_from_plan(self, plan, i, dataset) -> Batch:
        ds = dataset if dataset is not None else self.dataset
        return _take(ds, plan[i])


class _ClickFeedMixin:
    """Shared click-model plumbing for simulation feeds."""

    def _load_click_model(self):
        self.click_model = None
        if not self.hparams.oracle_mode:
            path = self.hparams.click_model_json
            if not os.path.isfile(path):
                raise FileNotFoundError(f"click model json not found: {path}")
            self.click_model = cm.load_model_from_file(path)

    def _eta_at_step(self, step: jax.Array) -> jax.Array:
        """Dynamic bias severity schedule
        (ref ``click_simulation_feed.py:166-172``): every
        `dynamic_bias_step_interval` batches eta grows by
        `dynamic_bias_eta_change`. Computed from the step counter so it is
        stateless and jit-safe."""
        base = self.click_model.eta
        change = float(self.hparams.get("dynamic_bias_eta_change", 0.0))
        if change == 0.0:
            return base
        interval = int(self.hparams.get("dynamic_bias_step_interval", 1000))
        return base + (step // interval).astype(jnp.float32) * change

    def _model_at_step(self, step):
        if self.click_model is None:
            return None
        return self.click_model.replace(eta=self._eta_at_step(step))


@register("feed", "ClickSimulationFeed",
          aliases=["ultra.input_layer.ClickSimulationFeed"])
class ClickSimulationFeed(BaseInputFeed, _ClickFeedMixin):
    """Offline click simulation on the fixed initial ranking
    (ref ``click_simulation_feed.py:24-294``)."""

    RESAMPLE_ROUNDS = 8  # query redraw rounds for resample_strategy=rounds

    def default_hparams(self):
        return {
            "click_model_json": "./example/ClickModel/pbm_0.1_1.0_4_1.0.json",
            "oracle_mode": False,
            "dynamic_bias_eta_change": 0.0,
            "dynamic_bias_step_interval": 1000,
            # Sample PBM clicks with the on-chip Pallas PRNG kernel
            # (ops/pallas/click_sim.py); PBM only, see BASELINE.md for the
            # measured on/off table.
            "use_pallas_click": False,
            # check_validation rejection sampling:
            #   'compact' — ONE overdrawn candidate pool (B * overdraw
            #     draws), keep the first B clicked candidates; exact
            #     rejection-sampling distribution at ~overdraw/(1+ROUNDS)
            #     of the simulation cost (see BASELINE.md r4 table);
            #   'rounds'  — 1+RESAMPLE_ROUNDS fresh draws per slot, first
            #     valid kept (the r2/r3 behavior).
            "resample_strategy": "compact",
            # Pool size multiple: fills B slots whenever the per-draw click
            # probability p satisfies Binom(B*overdraw, p) >= B with high
            # probability. 0 (default) = AUTO: measure p once at feed init
            # (one eager batched simulation over <=4096 queries) and size
            # the pool to B + 4*sqrt(B) expected clicked candidates with a
            # 3-sigma-lowered p estimate — typical click rates (~0.5-0.9)
            # need only ~1.3-2x, and the pool size is the feed's dominant
            # cost (BASELINE.md r4 feed table). Explicit values pin the
            # multiple; capped at 9 (the 'rounds' strategy's total draws).
            "resample_overdraw": 0.0,
        }

    def __init__(self, *args, check_validation: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.check_validation = check_validation
        self._load_click_model()
        self._p_click_lo = self._estimate_click_rate()

    def _estimate_click_rate(self):
        """One-time 3-sigma-lowered estimate of the per-draw probability
        of a clicked list, used to auto-size the compact pool. Returns
        None when auto-sizing does not apply (oracle mode, explicit
        overdraw, dynamic bias — whose eta schedule lowers the click rate
        over training — or a host-stacked dataset whose stripes are not
        uniformly addressable)."""
        if (not self.check_validation or self.hparams.oracle_mode
                or self.hparams.get("resample_strategy",
                                    "compact") != "compact"
                or float(self.hparams.get("resample_overdraw", 0.0)) > 0
                or float(self.hparams.get("dynamic_bias_eta_change", 0.0))
                or self.dataset.labels.ndim != 2):
            return None
        import math

        n = min(4096, self.dataset.num_queries)
        key = jax.random.PRNGKey(0x5EED)
        qs = jax.random.randint(key, (n,), 0, self.dataset.num_queries)
        _, valid = self._simulate_clicks(
            self.click_model, jax.random.fold_in(key, 1), qs, self.dataset)
        p = float(jnp.mean(valid.astype(jnp.float32)))
        return max(p - 3.0 * math.sqrt(max(p * (1 - p), 1e-6) / n),
                   p / 2.0, 1e-3)

    def _pool_size(self, batch_size: int) -> int:
        """Compact candidate-pool size for this (possibly per-shard) batch
        size: explicit overdraw multiple, or auto-sized from the measured
        click rate to B + 4*sqrt(B) expected clicked candidates."""
        import math

        explicit = float(self.hparams.get("resample_overdraw", 0.0))
        if explicit > 0:
            # Same [B, 9B] clamp as the auto branch: a multiple < 1 would
            # silently shrink every batch below batch_size.
            return int(min(max(round(batch_size * explicit), batch_size),
                           batch_size * 9))
        if self._p_click_lo is None:
            # Auto-sizing disabled (dynamic bias / host-stacked data):
            # spend the 'rounds' strategy's total draw budget (9 per
            # slot). A pooled 9B draws fills at least as many slots as 9
            # independent draws per slot at every click rate (the pool
            # shares each slot's excess), so these configs never fill
            # worse than the r2/r3 behavior.
            return batch_size * 9
        need = batch_size + 4.0 * math.sqrt(batch_size)
        return int(min(max(math.ceil(need / self._p_click_lo), batch_size),
                       batch_size * 9))

    def _simulate_clicks(self, model, rng, qs, ds: DeviceDataset
                         ) -> Tuple[jax.Array, jax.Array]:
        """Clicks for query indices `qs` WITHOUT touching the feature table
        — the [B, L] label/mask gathers are ~100x cheaper than the
        [B, L, F] feature gather, so the resample loop runs on these alone
        and the feature gather happens exactly once per batch."""
        L = self.rank_list_size
        labels = ds.labels[qs][:, :L]
        mask = ds.mask[qs][:, :L]
        if self.hparams.oracle_mode:
            clicks = labels * mask
        elif (self.hparams.get("use_pallas_click")
              and model.model_name == "position_biased_model"
              and jax.default_backend() == "tpu"):
            # The kernel draws with the TPU hardware PRNG
            # (pltpu.prng_random_bits), which has no CPU interpret
            # lowering — off-TPU the jnp sampler below is the fallback.
            from ultra_pytorch_tpu.ops.pallas.click_sim import (
                pallas_sample_pbm_clicks)
            clicks = pallas_sample_pbm_clicks(model, rng, labels, mask)
        else:
            clicks, _, _ = cm.sample_clicks(model, rng, labels, mask)
        return clicks, (clicks.sum(axis=1) > 0)

    def _draw(self, rng: jax.Array, step, ds: DeviceDataset):
        """One step's (query indices, clicks, valid) draw — the whole feed
        except the feature gather. Shared by the per-step path and the
        hoisted window plan."""
        model = self._model_at_step(step)
        Q = ds.num_queries
        B = self.batch_size
        k0, rng = jax.random.split(rng)
        if self.check_validation and not self.hparams.oracle_mode:
            if self.hparams.get("resample_strategy", "compact") == "compact":
                # Rejection sampling via one overdrawn pool: draw
                # C = B * overdraw iid (query, clicks) candidates in ONE
                # batched simulation and keep the first B clicked ones
                # (stable argsort on validity). Filtering iid draws on
                # validity keeps the kept samples iid with the exact
                # rejection distribution — the same distribution as the
                # reference's redraw-until-click loop — at a fraction of
                # the per-slot-rounds cost. Slots left without a clicked
                # candidate (P(Binom(C, p_click) < B), vanishing at
                # overdraw 2) are masked out of the loss like the rounds
                # strategy's exhausted slots.
                C = self._pool_size(B)
                qs_all = jax.random.randint(k0, (C,), 0, Q)
                clicks_all, valid_all = self._simulate_clicks(
                    model, rng, qs_all, ds)
                pick = jnp.argsort(~valid_all, stable=True)[:B]
                qs = qs_all[pick]
                clicks = clicks_all[pick]
                valid = valid_all[pick]
            else:
                # All resample rounds at once: draw (1 + RESAMPLE_ROUNDS)
                # candidate (query, clicks) pairs per slot as ONE batched
                # simulation and keep each slot's first clicked round — the
                # same first-valid distribution as sequential redrawing,
                # but a single fused op instead of R tiny dependent ones
                # (~60us off the feed at the bench shape;
                # tools/profile_step.py).
                R = 1 + self.RESAMPLE_ROUNDS
                qs_all = jax.random.randint(k0, (R, B), 0, Q)
                clicks_flat, valid_flat = self._simulate_clicks(
                    model, rng, qs_all.reshape(-1), ds)
                clicks_all = clicks_flat.reshape(R, B, -1)
                valid_all = valid_flat.reshape(R, B)
                first = jnp.argmax(valid_all, axis=0)  # first valid; 0 if none
                pick = (first, jnp.arange(B))
                qs = qs_all[pick]
                clicks = clicks_all[pick]
                valid = valid_all.any(axis=0)
        else:
            qs = jax.random.randint(k0, (B,), 0, Q)
            clicks, valid = self._simulate_clicks(model, rng, qs, ds)
        return qs, clicks, valid

    def _assemble(self, qs, clicks, valid, ds: DeviceDataset) -> Batch:
        batch = ds.gather(qs, list_size=self.rank_list_size)
        batch["labels"] = clicks
        if self.check_validation and not self.hparams.oracle_mode:
            # Lists that never clicked are masked out of the loss entirely.
            batch["mask"] = batch["mask"] * valid[:, None]
        return batch

    def train_batch(self, rng: jax.Array, state,
                    dataset: Optional[DeviceDataset] = None) -> Batch:
        ds = dataset if dataset is not None else self.dataset
        qs, clicks, valid = self._draw(rng, state.step, ds)
        return self._assemble(qs, clicks, valid, ds)

    def train_batch_plan(self, rng: jax.Array, state, dataset, n: int):
        """Hoist n steps of sampling + click simulation + compaction into
        one batched program (vmap of `_draw` over the window); the feature
        gather stays in the per-step body (`batch_from_plan`)."""
        ds = dataset if dataset is not None else self.dataset
        keys = jax.random.split(rng, n)
        steps = state.step + jnp.arange(n)
        return jax.vmap(lambda k, s: self._draw(k, s, ds))(keys, steps)

    def batch_from_plan(self, plan, i, dataset) -> Batch:
        ds = dataset if dataset is not None else self.dataset
        qs, clicks, valid = plan
        return self._assemble(qs[i], clicks[i], valid[i], ds)


class _OnlineSimulationFeed(BaseInputFeed, _ClickFeedMixin):
    """Online simulation: rank with the CURRENT ranker, simulate clicks on
    the re-ranked list (ref ``deterministic_online_simulation_feed.py`` /
    ``stochastic_online_simulation_feed.py``). The scoring + reranking +
    click sampling all run inside the caller's jitted train program."""

    CLICK_RESAMPLE_ROUNDS = 16  # click redraws on the fixed ranking

    def default_hparams(self):
        return {
            "click_model_json": "./example/ClickModel/pbm_0.1_1.0_4_1.0.json",
            "oracle_mode": False,
            # Dynamic bias severity schedule — declared on BOTH online feeds
            # (ref deterministic_online_simulation_feed.py:48-52,
            #  stochastic_online_simulation_feed.py:49-52); the schedule
            # itself lives in _ClickFeedMixin._eta_at_step.
            "dynamic_bias_eta_change": 0.0,
            "dynamic_bias_step_interval": 1000,
            # stochastic feed only (ref stochastic_...py:43-44):
            "tau": 1.0,
        }

    def __init__(self, *args, check_validation: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.check_validation = check_validation
        self._load_click_model()

    def _rank(self, rng, scores, mask) -> jax.Array:
        raise NotImplementedError

    def train_batch(self, rng: jax.Array, state,
                    dataset: Optional[DeviceDataset] = None) -> Batch:
        ds = dataset if dataset is not None else self.dataset
        model = self._model_at_step(state.step) if self.click_model else None
        kq, kr, kc = jax.random.split(rng, 3)
        qs = jax.random.randint(kq, (self.batch_size,), 0, ds.num_queries)
        batch = _take(ds, qs)

        # Score with the current ranker (the reference's model.validation
        # upcall, here fused into the same program).
        scores = self.algorithm.score(state, batch)
        ranking = self._rank(kr, scores, batch["mask"])       # [B, Lc]

        feats = jnp.take_along_axis(
            batch["features"], ranking[:, :, None], axis=1)
        labels = rerank(batch["labels"], ranking)
        mask = rerank(batch["mask"], ranking)
        init_scores = rerank(batch["initial_scores"], ranking)

        L = self.rank_list_size
        top_labels = labels[:, :L]
        top_mask = mask[:, :L]
        if self.hparams.oracle_mode:
            clicks = top_labels * top_mask
            valid = jnp.ones((clicks.shape[0],), bool)
        else:
            clicks, _, _ = cm.sample_clicks(model, kc, top_labels, top_mask)
            valid = clicks.sum(axis=1) > 0
            if self.check_validation:
                def body(carry, key):
                    clicks, valid = carry
                    c2, _, _ = cm.sample_clicks(model, key, top_labels,
                                                top_mask)
                    v2 = c2.sum(axis=1) > 0
                    take = (~valid) & v2
                    clicks = jnp.where(take[:, None], c2, clicks)
                    return (clicks, valid | v2), None

                keys = jax.random.split(jax.random.fold_in(kc, 7),
                                        self.CLICK_RESAMPLE_ROUNDS)
                (clicks, valid), _ = jax.lax.scan(
                    body, (clicks, valid), keys)

        # Labels beyond the cutoff are zeroed (ref stochastic_...py:170-176).
        full_clicks = jnp.concatenate(
            [clicks, jnp.zeros_like(labels[:, L:])], axis=1)
        if self.check_validation and not self.hparams.oracle_mode:
            mask = mask * valid[:, None]
        return {
            "features": feats,
            "labels": full_clicks,
            "mask": mask,
            "initial_scores": init_scores,
            "relevance": labels,  # true labels in ranked order (DBGD reward)
        }


@register("feed", "DeterministicOnlineSimulationFeed",
          aliases=["ultra.input_layer.DeterministicOnlineSimulationFeed"])
class DeterministicOnlineSimulationFeed(_OnlineSimulationFeed):
    """Rank by sorting scores descending
    (ref ``deterministic_online_simulation_feed.py:129-134``)."""

    def _rank(self, rng, scores, mask):
        return deterministic_rank(scores, mask)


@register("feed", "StochasticOnlineSimulationFeed",
          aliases=["ultra.input_layer.StochasticOnlineSimulationFeed"])
class StochasticOnlineSimulationFeed(_OnlineSimulationFeed):
    """Rank by Plackett-Luce sampling at temperature tau
    (ref ``stochastic_online_simulation_feed.py:129-147``), implemented as
    Gumbel-top-k."""

    def _rank(self, rng, scores, mask):
        return plackett_luce_sample(rng, scores, mask,
                                    tau=float(self.hparams.tau))
