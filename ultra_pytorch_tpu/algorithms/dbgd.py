"""Dueling Bandit Gradient Descent (DBGD) — online LTR bandit.

Capability parity with ref ``ultra/learning_algorithm/dbgd.py`` (Yue &
Joachims ICML'09). One fused train step:

  * sample a unit noise direction over the ranker's linear weights
    (column-normalized N(0,1), ref ``create_noisy_param`` ``:224-231``);
  * score the list with the current ranker and the perturbed candidate
    ``params + learning_rate * noise``;
  * decide winners either by TEAM-DRAFT INTERLEAVING + click simulation
    (ref ``click_simulation_winners`` ``:248-324``: Plackett-Luce or
    deterministic per-ranker rankings, multileave, clicks via the
    algorithm's own click model with resample-until-click, click-share
    credit) — fully on-device here — or by batch NDCG gains
    (ref ``:139-149``);
  * the "gradient" is the winner-weighted noise written into the optimizer
    (ref ``compute_gradient`` ``:196-222``), here a pure pytree
    ``grad = mean(winner_share) * noise`` fed to the SGD/Adagrad update.

Documented divergence, selectable via ``candidate_source``: the
reference's perturbed candidate is a FRESH randomly initialized model
plus noise (``create_new_output_list`` ``:233-246`` builds
``model_prime`` from scratch — a porting artifact). The default here
(``candidate_source=perturb``) uses the current parameters plus scaled
noise, the algorithm the paper (and the original TF ULTRA) defines;
``candidate_source=fresh`` replicates the reference torch port's
from-scratch candidate (measured equivalent on the convergence protocol,
BASELINE.md MGD note).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ultra_pytorch_tpu.algorithms.base import BaseAlgorithm, TrainState
from ultra_pytorch_tpu.metrics.ranking import (
    normalized_discounted_cumulative_gain)
from ultra_pytorch_tpu.models import base as model_base
from ultra_pytorch_tpu.sim import click_models as cm
from ultra_pytorch_tpu.sim.interleave import (
    infer_winners, team_draft_interleave)
from ultra_pytorch_tpu.sim.sampling import (
    deterministic_rank, plackett_luce_sample, rerank)
from ultra_pytorch_tpu.utils.registry import register


@register("algorithm", "DBGD", aliases=["ultra.learning_algorithm.DBGD"])
class DBGD(BaseAlgorithm):

    name = "dbgd"
    CLICK_RESAMPLE_ROUNDS = 16  # ref MAX_SAMPLE_ROUND_NUM=100 (cheap rounds)

    def default_hparams(self):
        # ref dbgd.py:47-56
        return {
            "click_model_json": "./example/ClickModel/pbm_0.1_1.0_4_1.0.json",
            "learning_rate": 0.5,
            "max_gradient_norm": 5.0,
            "need_interleave": True,
            "interleave_strategy": "Stochastic",
            "grad_strategy": "sgd",
            "tau": 1.0,
            "ranker_num": 1,  # number of PERTURBED rankers (DBGD: 1)
            # Candidate scoring base: "perturb" = current params + lr*noise
            # (the DBGD/MGD papers and the original TF ULTRA); "fresh" =
            # a freshly initialized model + lr*noise (what the reference's
            # torch port actually does — ref dbgd.py:233-246 builds
            # model_prime from scratch each step). "fresh" makes winner
            # credit nearly independent of the noise direction, so updates
            # stay tiny once the current ranker beats random — an
            # accidentally-conservative variant that can edge out the
            # paper algorithm on short noisy protocols (BASELINE.md MGD
            # note).
            "candidate_source": "perturb",
        }

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.ranker_num = int(self.hparams.get("ranker_num", 1))
        self.click_model = None
        if self.hparams.need_interleave:
            self.click_model = cm.load_model_from_file(
                self.hparams.click_model_json)

    # -- noise -------------------------------------------------------------
    def _sample_noises(self, rng, params) -> List:
        keys = jax.random.split(rng, self.ranker_num)
        return [model_base.dbgd_noise_like(k, params) for k in keys]

    # -- winner inference --------------------------------------------------
    def _interleave_winners(self, rng, score_list, batch):
        """(winners [B, R+1] click-share credit, clicks [B, L] on the SHOWN
        multileaved list, online nDCG of that list or None) via
        multileaving (ref :248-324). The clicks are the per-step ONLINE
        REWARD — what the simulated user actually gave the list the
        bandit presented — and online nDCG scores the shown ordering
        against true relevance when an online feed attached it; both are
        logged per step (the online-LTR literature's cumulative-
        performance axis; neither the reference nor its companion papers
        log it, but it is free here)."""
        mask = batch["mask"]
        labels = batch["labels"]
        L = min(self.rank_list_size, labels.shape[1])
        k_rank, k_draft, k_click = jax.random.split(rng, 3)

        rankings = []
        rank_keys = jax.random.split(k_rank, len(score_list))
        for scores, rk in zip(score_list, rank_keys):
            if self.hparams.interleave_strategy == "Stochastic":
                rankings.append(plackett_luce_sample(
                    rk, scores, mask, tau=float(self.hparams.tau)))
            else:
                rankings.append(deterministic_rank(scores, mask))
        rankings = jnp.stack(rankings, axis=1)        # [B, R+1, Lc]

        multileaved, teams = team_draft_interleave(k_draft, rankings)
        ml_labels = rerank(labels, multileaved)
        ml_mask = rerank(mask, multileaved)

        top_labels = ml_labels[:, :L]
        top_mask = ml_mask[:, :L]
        clicks, _, _ = cm.sample_clicks(self.click_model, k_click,
                                        top_labels, top_mask)
        valid = clicks.sum(axis=1) > 0

        def body(carry, key):
            clicks, valid = carry
            c2, _, _ = cm.sample_clicks(self.click_model, key,
                                        top_labels, top_mask)
            v2 = c2.sum(axis=1) > 0
            take = (~valid) & v2
            return (jnp.where(take[:, None], c2, clicks), valid | v2), None

        keys = jax.random.split(jax.random.fold_in(k_click, 3),
                                self.CLICK_RESAMPLE_ROUNDS)
        (clicks, _), _ = jax.lax.scan(body, (clicks, valid), keys)

        # Online nDCG of the multileaved SHOWN list against TRUE relevance
        # (only when an online feed attached it) — what the user
        # experienced while the bandit explored.
        online_ndcg = None
        if "relevance" in batch:
            from ultra_pytorch_tpu.metrics.ranking import mask_padding
            rel_ml = rerank(batch["relevance"], multileaved)[:, :L]
            shown_scores = mask_padding(
                -jnp.broadcast_to(jnp.arange(L, dtype=jnp.float32),
                                  top_mask.shape), top_mask)
            online_ndcg = normalized_discounted_cumulative_gain(
                rel_ml * top_mask, shown_scores, None, [L])[0]
        return (infer_winners(teams[:, :L], clicks, len(score_list)),
                clicks, online_ndcg)

    def _ndcg_winners(self, score_list, batch):
        """[R+1] batch-NDCG-gain credit (ref :139-149)."""
        labels = batch["labels"][:, :self.rank_list_size]
        mask = batch["mask"][:, :self.rank_list_size]
        masked = [jnp.where(mask > 0, s[:, :self.rank_list_size], -1e9)
                  for s in score_list]
        ndcgs = jnp.stack([
            normalized_discounted_cumulative_gain(
                labels, s, None, [self.rank_list_size])[0]
            for s in masked])
        gains = jnp.ceil(ndcgs - ndcgs[0])
        return gains / (jnp.sum(gains) + 1e-9)

    # -- aux hook (NSGD overrides to maintain its bad-noise memory) --------
    def _update_aux(self, state, noises, win_totals):
        return state.aux

    def _sample_noises_with_state(self, rng, state):
        return self._sample_noises(rng, state.params)

    # -- train -------------------------------------------------------------
    def train_step(self, state: TrainState, batch, rng):
        params = state.params
        k_noise, k_win = jax.random.split(rng)
        # Candidate noise directions are REPLICA-IDENTICAL under DP (every
        # shard evaluates the same candidates, so the multileaved comparison
        # becomes one big experiment over the global batch); the
        # interleave/click randomness below is per-shard.
        k_win = self.per_shard_rng(k_win)
        noises = self._sample_noises_with_state(k_noise, state)
        lr = float(self.hparams.learning_rate)

        score_list = [self.score_with_params(params, batch,
                                             is_training=False)]
        fresh = self.hparams.get("candidate_source", "perturb") == "fresh"
        fresh_keys = jax.random.split(jax.random.fold_in(k_noise, 17),
                                      len(noises))
        for noise, fk in zip(noises, fresh_keys):
            base_params = (self.ranker.init(fk, self.ranker.feature_size)
                           if fresh else params)
            cand = model_base.perturb(base_params, noise, lr)
            score_list.append(self.score_with_params(cand, batch,
                                                     is_training=False))

        online_reward = online_ndcg = None
        if self.hparams.need_interleave:
            winners, shown_clicks, online_ndcg = self._interleave_winners(
                k_win, score_list, batch)
            win_share = jnp.mean(winners, axis=0)          # [R+1]
            win_totals = jnp.sum(winners, axis=0)          # [R+1]
            # Mean clicks per presented list = per-step online reward.
            online_reward = self.sync(jnp.mean(shown_clicks.sum(axis=1)))
            if online_ndcg is not None:
                online_ndcg = self.sync(online_ndcg)
        else:
            win_share = self._ndcg_winners(score_list, batch)
            win_totals = win_share
        # Cross-replica mean: winner credit aggregates over the GLOBAL batch
        # (noises are replica-identical, so this is exact), and NSGD's
        # bad-noise memory update sees the same loser flags on every
        # replica (pmean of nonnegative totals is 0 iff the global total is).
        win_share = self.sync(win_share)
        win_totals = self.sync(win_totals)

        # grad = sum_r winner_share[r+1] * noise_r (ref :196-222: the
        # current ranker's row of the gradient matrix is zeros).
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        for r, noise in enumerate(noises):
            w = win_share[r + 1]
            grads = jax.tree_util.tree_map(
                lambda g, n, w=w: g + w * n, grads, noise)

        new_params, opt_state = self.apply_updates(
            self.optimizer(), params, state.opt_state, grads)

        # Reported loss = 1 - NDCG of the current ranker (ref :129-133).
        labels = batch["labels"][:, :self.rank_list_size]
        mask = batch["mask"][:, :self.rank_list_size]
        cur = jnp.where(mask > 0,
                        score_list[0][:, :self.rank_list_size], -1e9)
        ndcg0 = normalized_discounted_cumulative_gain(
            labels, cur, None, [self.rank_list_size])[0]
        new_aux = self._update_aux(state, noises, win_totals)
        metrics = {"loss": 1.0 - ndcg0}
        if online_reward is not None:
            metrics["online_reward"] = online_reward
        if online_ndcg is not None:
            metrics["online_ndcg"] = online_ndcg
        return state.replace(params=new_params, opt_state=opt_state,
                             aux=new_aux, step=state.step + 1), metrics
