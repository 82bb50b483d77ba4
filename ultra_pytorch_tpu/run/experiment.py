"""Experiment assembly + train/eval loops.

The driver-layer equivalent of the reference's ``main.py`` (ref
``main.py:65-292``): reads the same experiment-JSON schema
(``train/valid/test_input_feed`` + hparam strings + ``ranking_model`` +
``learning_algorithm`` + ``metrics``/``metrics_topn``/``objective_metric``),
resolves components through the registry, and runs:

  * a fused, jitted train step: sample queries -> gather features ->
    simulate clicks -> algorithm update, all one XLA program (the reference
    rebuilds a numpy feed dict on host every step, ref ``main.py:151-223``);
  * periodic validation with weighted summary merging
    (ref ``main.py:170-190``);
  * best-objective checkpointing of the FULL train state
    (ref ``main.py:198-214`` saves only the ranker).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ultra_pytorch_tpu.data import dataset as data_lib
from ultra_pytorch_tpu.data.trec import output_ranklist
from ultra_pytorch_tpu.utils import checkpoint as ckpt_lib
from ultra_pytorch_tpu.utils.registry import find_class

# Checkpoint state-layout version; bump when TrainState's leaf structure
# changes (r4: optimizer state flattened to one vector, optax.flatten).
STATE_FORMAT = "opt-flat-r4"


def create_algorithm(exp_settings: Dict[str, Any], feature_size: int,
                     max_label: float):
    """Build ranker + algorithm from experiment settings
    (ref ``main.py:65-83`` create_model + ``base_algorithm.py:156-167``)."""
    ranker_cls = find_class(exp_settings["ranking_model"], kind="ranker")
    ranker = ranker_cls(exp_settings.get("ranking_model_hparams", ""),
                        feature_size)
    algo_cls = find_class(exp_settings["learning_algorithm"],
                          kind="algorithm")
    return algo_cls(ranker, exp_settings, max_label=max_label)


class Experiment:
    """One configured experiment over a dataset directory."""

    def __init__(self, exp_settings: Dict[str, Any], data_dir: str,
                 model_dir: str, batch_size: int = 256,
                 data_format: str = "ULTRA", seed: int = 0,
                 rank_cut: Optional[int] = None,
                 dp: Optional[int] = None,
                 split_prefixes: Optional[Dict[str, str]] = None,
                 force_host_stacked: bool = False,
                 shard_data: bool = False):
        """Args:
          split_prefixes: optional {split: file prefix} overrides (the
            reference's --train/valid/test_data_prefix flags,
            ref ``main.py:26-30``); default is the split name itself.
          dp: data-parallel device count. None = auto (use every visible
            device when there is more than one and batch_size divides
            evenly); 0 or 1 = single-device; k>1 = exactly k devices
            (raises if batch_size % k != 0). The reference has no
            distributed mode at all (SURVEY.md §2.10) — this subsystem is
            new, built on jax.sharding.Mesh + shard_map (parallel/mesh.py).
          force_host_stacked: route the train split through the multi-host
            data path (host stripe -> host_stacked_dataset global array ->
            in-shard unwrap) even in a single process — used by the
            multichip dryrun so the host-stacked array plumbing is
            validated without a real multi-process launch.
          shard_data: shard the TRAIN feature table over the DP mesh
            (device i holds query stripe i + only its referenced feature
            rows, parallel/mesh.py device_sharded_dataset) so tables too
            big to replicate per-device (full Istella ~9 GB on a 16 GB
            v5e) still train; requires a DP mesh. Single-process only
            (multi-host runs already stripe per host).
        """
        self.exp_settings = exp_settings
        self.data_dir = data_dir
        self.model_dir = model_dir
        self.batch_size = batch_size
        self.data_format = data_format
        self.seed = seed
        self.rank_cut = rank_cut
        self.split_prefixes = split_prefixes or {}
        # Accept main.py's string policy values too ("auto"/"off"/"N").
        if isinstance(dp, str):
            dp = None if dp == "auto" else 0 if dp == "off" else int(dp)
        self.dp = dp
        self.force_host_stacked = force_host_stacked
        self.shard_data = shard_data
        self.mesh = None
        self._compiled = {}
        self._host_stacked = False
        # Host-side mirror of state.step: validation tie-break keys derive
        # from (seed, step), and reading state.step off the device would
        # cost a blocking round trip per validation (~50 ms through this
        # deployment's tunnel — the r4 eval path paid it every pass).
        self._host_step = 0

    def _resolve_mesh(self):
        """Decide the DP mesh per the `dp` policy (see __init__)."""
        if self.dp in (0, 1):
            return None
        n_avail = jax.device_count()
        if self.dp is None:
            n = n_avail
            if n <= 1 or self.batch_size % n != 0:
                return None
        else:
            n = int(self.dp)
            if n > n_avail:
                raise ValueError(
                    f"--dp={n} but only {n_avail} devices visible")
            if self.batch_size % n != 0:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by dp={n}")
        from ultra_pytorch_tpu.parallel import make_mesh
        return make_mesh(n)

    # -- data -------------------------------------------------------------
    def load_split(self, split: str) -> data_lib.RankingDataset:
        click_model_dir = (self.exp_settings.get("click_model_dir")
                           if self.data_format == "ULTRE" else None)
        prefix = self.split_prefixes.get(split, split)
        return data_lib.read_data(self.data_dir, prefix, self.rank_cut,
                                  click_model_dir)

    def setup(self, splits=("train", "valid")):
        """Read data, resolve max_candidate_num / selection_bias_cutoff
        (ref ``main.py:99,110-116``), pad, build components."""
        self.datasets = {s: self.load_split(s) for s in splits}
        # max_candidate_num is computed from the FULL data (each split's
        # rank_list_size is set at load time) BEFORE any per-host stripe,
        # so every host compiles identical shapes.
        max_candidate_num = max(
            d.rank_list_size for d in self.datasets.values())
        self.mesh = self._resolve_mesh()
        if jax.process_count() > 1 and "train" in self.datasets:
            # Multi-host DP: each host keeps a stripe of the training
            # queries + only the feature rows they reference (valid/test
            # stay replicated so summary merging needs no cross-host
            # reduction).
            from ultra_pytorch_tpu.parallel import shard_queries_for_host
            self.datasets["train"] = shard_queries_for_host(
                self.datasets["train"])
        self.exp_settings["max_candidate_num"] = max_candidate_num
        cutoff = self.exp_settings.get("selection_bias_cutoff",
                                       max_candidate_num)
        self.exp_settings["selection_bias_cutoff"] = min(
            cutoff, max_candidate_num) if cutoff > 0 else max_candidate_num
        for d in self.datasets.values():
            d.pad(max_candidate_num)

        train_like = self.datasets.get("train") or next(
            iter(self.datasets.values()))
        self.max_label = max(d.max_label for d in self.datasets.values())
        self.algorithm = create_algorithm(
            self.exp_settings, train_like.feature_size, self.max_label)

        multihost = ((jax.process_count() > 1 or self.force_host_stacked)
                     and self.mesh is not None)
        shard_data = self.shard_data and self.mesh is not None
        if self.shard_data and self.mesh is None:
            raise ValueError("--shard_data requires a DP mesh (dp > 1)")
        if shard_data and jax.process_count() > 1:
            raise ValueError("--shard_data is single-process only "
                             "(multi-host runs already stripe per host)")
        # Both paths hand the train step a leading-device-axis global
        # array that the shard body unwraps (host_sharded_data=True).
        self._host_stacked = multihost or shard_data
        self.device_data = {}
        for s, d in self.datasets.items():
            if s == "train" and shard_data:
                # FEATURE-TABLE sharding: device i holds query stripe i +
                # only its referenced feature rows (~1/N of the table per
                # device; parallel/mesh.py device_sharded_dataset).
                from ultra_pytorch_tpu.parallel import device_sharded_dataset
                self.device_data[s] = device_sharded_dataset(d, self.mesh)
                continue
            if multihost and s == "train":
                # The train split is HOST-STRIPED (different per process);
                # assemble the stripes into one global array with a leading
                # per-device axis (parallel/mesh.py host_stacked_dataset) —
                # a replicated device_put would reject the value mismatch.
                from ultra_pytorch_tpu.parallel import host_stacked_dataset
                self.device_data[s] = host_stacked_dataset(d, self.mesh)
                continue
            dev = d.to_device()
            if self.mesh is not None:
                from ultra_pytorch_tpu.parallel import shard_dataset
                dev = shard_dataset(dev, self.mesh)
            self.device_data[s] = dev

        self.feeds = {}
        for split, role in (("train", "train"), ("valid", "valid"),
                            ("test", "test")):
            if split not in self.datasets:
                continue
            feed_cls = find_class(
                self.exp_settings[f"{role}_input_feed"], kind="feed")
            self.feeds[split] = feed_cls(
                self.algorithm, self.batch_size,
                self.exp_settings.get(f"{role}_input_hparams", ""),
                self.device_data[split],
                # Host-stacked train data has a leading device axis, so the
                # feed cannot infer the list size from array shapes.
                list_size=self.datasets[split].rank_list_size)
        return self

    # -- state ------------------------------------------------------------
    def init_state(self):
        rng = jax.random.PRNGKey(self.seed)
        k_init, self._data_rng = jax.random.split(rng)
        train_like = self.datasets.get("train") or next(
            iter(self.datasets.values()))
        self.state = self.algorithm.init_state(
            k_init, train_like.feature_size)
        self._host_step = 0
        self._place_state()
        return self.state

    def _place_state(self):
        """Replicate state over the DP mesh (no-op single-device)."""
        if self.mesh is not None:
            from ultra_pytorch_tpu.parallel import replicated_sharding
            rep = replicated_sharding(self.mesh)
            self.state = jax.device_put(self.state, rep)
            self._data_rng = jax.device_put(self._data_rng, rep)

    @property
    def ckpt_path(self) -> str:
        algo_name = self.exp_settings["learning_algorithm"].rsplit(".", 1)[-1]
        return os.path.join(self.model_dir, f"{algo_name}.ckpt")

    def snapshot_state(self):
        """Device-side copy of (state, data_rng) — one tiny compiled
        program, no host transfer. The pipelined driver loop snapshots at
        each window boundary so the best-objective checkpoint decision can
        be made one window later (after the summary transfer has overlapped
        with the next window's compute) and still save the EXACT state the
        winning summary measured; the live buffers are donated to the next
        window by then."""
        if "snapshot" not in self._compiled:
            self._compiled["snapshot"] = jax.jit(
                lambda tree: jax.tree_util.tree_map(jnp.copy, tree))
        return self._compiled["snapshot"]((self.state, self._data_rng))

    def save(self, extra: Dict[str, Any] = None, state_and_rng=None):
        """Checkpoint the full train state; `state_and_rng` (a
        :meth:`snapshot_state` result) overrides the live buffers."""
        meta = dict(extra or {})
        # Key shapes depend on the PRNG impl (threefry (2,) vs rbg (4,));
        # record it so a mismatched --prng at restore is a clear error.
        meta.setdefault("prng_impl", str(jax.config.jax_default_prng_impl))
        # Optimizer-state layout version: r4 flattened opt_state into one
        # vector (optax.flatten, algorithms/base.py). Recorded so restores
        # across layout changes fail with a clear message, like the prng
        # guard below, instead of a deep template mismatch.
        meta.setdefault("state_format", STATE_FORMAT)
        # Embed the model schema so serving (serve/scorer.py) can rebuild
        # the ranker + state template without the settings file. Settings
        # are saved AFTER setup() resolved max_candidate_num /
        # selection_bias_cutoff, which aux-state shapes depend on.
        serializable = {}
        for k, v in self.exp_settings.items():
            try:
                json.dumps(v)
                serializable[k] = v
            except TypeError:
                pass
        meta.setdefault("serve", {
            "exp_settings": serializable,
            "feature_size": int(self.datasets[next(
                iter(self.datasets))].feature_size),
            "max_label": float(self.max_label),
        })
        ckpt_lib.save_checkpoint(
            self.ckpt_path,
            state_and_rng if state_and_rng is not None
            else (self.state, self._data_rng), meta)

    def restore(self, path: Optional[str] = None,
                params_only: bool = False) -> bool:
        """Restore full train state. `path` (the --start_checkpoint flag)
        overrides the default <model_dir>/<algo>.ckpt; an explicit path
        that does not exist is an error rather than a silent fresh start.

        `params_only` (the --restore_params_only flag) loads just the
        ranker weights — the migration path for checkpoints written under
        an older optimizer-state layout (params are layout-independent;
        optimizer/aux state and step start fresh)."""
        ckpt = path or self.ckpt_path
        if ckpt.endswith(".npz"):
            ckpt = ckpt[: -len(".npz")]
        if not ckpt_lib.checkpoint_exists(ckpt):
            if path:
                raise FileNotFoundError(
                    f"--start_checkpoint {path}: no checkpoint there")
            return False
        if not hasattr(self, "state"):
            self.init_state()
        if params_only:
            # No metadata needed: params are layout-independent, and the
            # prng/state-format guards below only apply to full restores.
            self.state = self.state.replace(
                params=ckpt_lib.load_params_prefix(ckpt, self.state.params))
            self._place_state()
            return True
        meta = ckpt_lib.read_metadata(ckpt)
        saved_prng = meta.get("prng_impl")
        cur_prng = str(jax.config.jax_default_prng_impl)
        if saved_prng and saved_prng != cur_prng:
            raise ValueError(
                f"checkpoint {ckpt} was written with "
                f"--prng {saved_prng} but this run uses --prng {cur_prng}; "
                "rerun with the matching --prng (key shapes differ)")
        saved_fmt = meta.get("state_format", "opt-per-leaf-r3")
        if saved_fmt != STATE_FORMAT:
            raise ValueError(
                f"checkpoint {ckpt} uses state layout '{saved_fmt}' but "
                f"this build writes '{STATE_FORMAT}' (the r4 optimizer "
                "state is one flattened vector). Pass "
                "--restore_params_only to carry the ranker weights into a "
                "fresh optimizer state, or evaluate the old checkpoint "
                "with serve/scorer.py")
        (self.state, self._data_rng), _ = ckpt_lib.load_checkpoint(
            ckpt, template=(self.state, self._data_rng))
        self._data_rng = jax.numpy.asarray(self._data_rng)
        # One device read at restore keeps the host step mirror honest.
        self._host_step = int(jax.device_get(self.state.step))
        self._place_state()
        return True

    # -- train ------------------------------------------------------------
    def _train_step_fn(self):
        if "train_step" not in self._compiled:
            feed = self.feeds["train"]
            alg = self.algorithm
            if self.mesh is not None:
                from ultra_pytorch_tpu.parallel import make_dp_train_step
                self._compiled["train_step"] = make_dp_train_step(
                    alg, feed, self.mesh,
                    host_sharded_data=self._host_stacked)
            else:
                # The dataset is an explicit jit ARGUMENT (DeviceDataset is
                # a pytree): closing over it would embed the feature table
                # as an HLO constant (unshippable at MSLR/Yahoo scale).
                def fused(state, rng, data):
                    k_batch, k_train = jax.random.split(rng)
                    batch = feed.train_batch(k_batch, state, data)
                    return alg.train_step(state, batch, k_train)

                self._compiled["train_step"] = jax.jit(fused,
                                                       donate_argnums=(0,))
        return self._compiled["train_step"]

    def _train_multi_fn(self, window: int):
        """A whole checkpoint window as ONE compiled program: lax.scan over
        `window` fused steps, so the host dispatches once per window
        instead of once per step (the reference pays full host-side batch
        assembly every step, ref ``main.py:151-223``)."""
        key = ("train_multi", window)
        if key not in self._compiled:
            feed = self.feeds["train"]
            alg = self.algorithm
            if self.mesh is not None:
                from ultra_pytorch_tpu.parallel import make_dp_train_step
                dp = make_dp_train_step(alg, feed, self.mesh, window=window,
                                        host_sharded_data=self._host_stacked)

                def dp_multi(state, rng, data):
                    rng, sub = jax.random.split(rng)
                    new_state, metrics = dp(state, sub, data)
                    return new_state, rng, metrics

                self._compiled[key] = dp_multi
                return self._compiled[key]

            plan_capable = feed.can_plan()

            def multi(state, rng, data):
                # `data` is a tracer here, so the scan body referencing it
                # is a loop-invariant operand, not an embedded constant.
                if plan_capable:
                    # Hoist the window's sampling + click simulation out
                    # of the scan: one batched op-set instead of `window`
                    # small sequential ones (feeds.py train_batch_plan).
                    rng, k_plan = jax.random.split(rng)
                    plan = feed.train_batch_plan(k_plan, state, data,
                                                 window)

                    def body(carry, i):
                        state, rng = carry
                        rng, k_train = jax.random.split(rng)
                        batch = feed.batch_from_plan(plan, i, data)
                        state, metrics = alg.train_step(state, batch,
                                                        k_train)
                        return (state, rng), metrics

                    (state, rng), metrics = jax.lax.scan(
                        body, (state, rng), jnp.arange(window))
                else:
                    def body(carry, _):
                        state, rng = carry
                        rng, k_batch, k_train = jax.random.split(rng, 3)
                        batch = feed.train_batch(k_batch, state, data)
                        state, metrics = alg.train_step(state, batch,
                                                        k_train)
                        return (state, rng), metrics

                    (state, rng), metrics = jax.lax.scan(
                        body, (state, rng), None, length=window)
                return state, rng, jax.tree_util.tree_map(
                    lambda m: jnp.mean(m, axis=0), metrics)

            self._compiled[key] = jax.jit(multi, donate_argnums=(0, 1))
        return self._compiled[key]

    def train_steps_device(self, num_steps: int, fuse_window: bool = True):
        """Dispatch `num_steps` steps; returns the window-mean metric tree
        as UNFETCHED device arrays (no host round trip — the caller decides
        when to pay the transfer, see :meth:`train_steps` /
        ``main.py``'s pipelined window loop).

        Only ONE scan-window length is ever compiled: the first fused call's
        window becomes canonical, and later calls are decomposed into
        canonical-size chunks plus single steps for the tail. Without this
        the final partial window of a run (max_train_iteration %
        steps_per_checkpoint != 0) would compile a second multi-step
        program — compilation costs minutes on this deployment.
        """
        parts = []  # (metric tree on device, step count)
        if fuse_window and num_steps > 1:
            if getattr(self, "_canonical_window", None) is None:
                self._canonical_window = num_steps
            window = self._canonical_window
            done = 0
            while num_steps - done >= window and window > 1:
                multi = self._train_multi_fn(window)
                self.state, self._data_rng, metrics = multi(
                    self.state, self._data_rng, self.device_data["train"])
                parts.append((metrics, window))
                done += window
            if num_steps - done:
                parts.append(self._run_single_steps_device(num_steps - done))
        else:
            parts.append(self._run_single_steps_device(num_steps))
        self._host_step += num_steps
        if len(parts) == 1:
            # A lone part always covers exactly num_steps (one canonical
            # window, the whole-request single-step path, or fuse off).
            tree, _ = parts[0]
            return tree
        total = None
        for tree, n in parts:
            scaled = jax.tree_util.tree_map(
                lambda v: v * (n / num_steps), tree)
            total = scaled if total is None else jax.tree_util.tree_map(
                jnp.add, total, scaled)
        return total

    def train_steps(self, num_steps: int, fuse_window: bool = True):
        """Run `num_steps` steps; returns mean metrics of the window as
        host floats (ONE device->host transfer for the whole tree — the
        r4 path paid one blocking round trip per metric)."""
        tree = self.train_steps_device(num_steps, fuse_window)
        host = jax.device_get(tree)
        return {k: float(v) for k, v in host.items()}

    def _run_single_steps_device(self, num_steps: int):
        step_fn = self._train_step_fn()
        agg = None
        for _ in range(num_steps):
            self._data_rng, sub = jax.random.split(self._data_rng)
            self.state, metrics = step_fn(self.state, sub,
                                          self.device_data["train"])
            agg = metrics if agg is None else jax.tree_util.tree_map(
                jnp.add, agg, metrics)
        return (jax.tree_util.tree_map(lambda v: v / num_steps, agg),
                num_steps)

    # -- eval -------------------------------------------------------------
    def _metric_keys(self):
        """Static `{metric}_{n}` key order of a validation summary."""
        return sorted(
            f"{m}_{n}"
            for m in self.exp_settings.get("metrics", ["mrr", "ndcg"])
            for n in self.exp_settings.get("metrics_topn", [3, 5, 10]))

    def _fused_validate_fn(self, num_queries: int):
        """A COMPLETE validation pass as ONE compiled program returning ONE
        stacked [n_metrics] vector: lax.scan over the full batches plus the
        statically-shaped tail batch, count-weighted merge on device (the
        exact ``merge_summary`` semantics), metrics stacked so the host
        pays a single transfer.

        The r3/r4 path cost ~14 tunnel round trips per pass at MSLR shape
        (two dispatches + one blocking float() per metric per dispatch +
        a state.step read) — ~0.35 s of pure latency for ~3 ms of device
        work. This program leaves exactly one dispatch and one transfer;
        `validate_device` doesn't even block on that one (BASELINE.md r5
        eval section)."""
        key = ("validate_fused", num_queries)
        if key not in self._compiled:
            alg = self.algorithm
            B = self.batch_size
            Q = num_queries
            n_full, tail = divmod(Q, B)
            keys = self._metric_keys()

            def merged_summary(state, data, rng):
                parts = []  # (summary dict, query count)
                if n_full:
                    starts = jnp.arange(n_full, dtype=jnp.int32) * B

                    def body(_, start):
                        batch = data.gather(start + jnp.arange(B))
                        k = None if rng is None else jax.random.fold_in(
                            rng, start)
                        _, summary = alg.validation_metrics(
                            state, batch, rng=k)
                        return None, summary

                    _, summaries = jax.lax.scan(body, None, starts)
                    parts.append((jax.tree_util.tree_map(
                        lambda s: jnp.mean(s, axis=0), summaries),
                        n_full * B))
                if tail:
                    batch = data.gather(jnp.arange(n_full * B, Q))
                    k = None if rng is None else jax.random.fold_in(
                        rng, n_full * B)
                    _, summary = alg.validation_metrics(state, batch, rng=k)
                    parts.append((summary, tail))
                merged = {
                    k: sum(s[k] * (c / Q) for s, c in parts) for k in keys}
                return jnp.stack([merged[k] for k in keys])

            self._compiled[key] = jax.jit(merged_summary)
        return self._compiled[key]

    def _eval_rng(self):
        """Tie-break key for this validation pass, or None when disabled.

        Derived from (seed, current step) so reruns are bit-reproducible;
        `eval_shuffle_ties` (exp setting, default ON) mirrors the
        reference's shuffle_ties=True metric sorting (ref
        ``metric_utils.py:49-85``) — without it, tied scores (e.g. an
        untrained ranker on click data) are scored in initial-list order.
        """
        if not self.exp_settings.get("eval_shuffle_ties", True):
            return None
        # self._host_step mirrors state.step (reading the device scalar
        # would cost a blocking tunnel round trip per validation pass).
        return jax.random.fold_in(
            jax.random.PRNGKey(self.seed ^ 0x7EB7), self._host_step)

    def validate_device(self, split: str = "valid"):
        """Dispatch a full validation pass; returns (keys, device vector)
        WITHOUT blocking — the device vector holds the count-weighted
        summary in `keys` order. Callers fetch with one jax.device_get
        when they actually need the numbers (main.py overlaps that fetch
        with the next train window's compute)."""
        data = self.device_data[split]
        fused = self._fused_validate_fn(data.num_queries)
        return self._metric_keys(), fused(self.state, data, self._eval_rng())

    def validate(self, split: str = "valid"):
        """Full-split evaluation with weighted summary merge
        (ref ``main.py:170-190`` + ``data_utils.py:501-514``): one
        compiled program, one blocking transfer."""
        keys, vec = self.validate_device(split)
        return dict(zip(keys, map(float, jax.device_get(vec))))

    def test_scores(self, split: str = "test") -> np.ndarray:
        """Scores over the full split in initial-list order [Q, L]."""
        alg = self.algorithm
        score_fn = jax.jit(lambda state, batch: alg.score(state, batch))
        chunks = []
        for batch, _, count in self.feeds[split].eval_batches():
            scores = score_fn(self.state, batch)
            chunks.append(np.asarray(scores)[:count])
        return np.concatenate(chunks, axis=0)

    def write_ranklist(self, split: str = "test", output_dir: str = None):
        scores = self.test_scores(split)
        return output_ranklist(self.datasets[split], scores,
                               output_dir or self.model_dir, split), scores
