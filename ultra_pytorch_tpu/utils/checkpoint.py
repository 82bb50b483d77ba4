"""Full-train-state checkpointing.

The reference checkpoints only the ranker's weights (``torch.save(
model.model.state_dict())``, ref ``main.py:198-214``) — DLA's propensity
tower, Regression-EM's propensity vector, PairwiseDebias' t+/t-, optimizer
accumulators and RNG are all lost on resume (SURVEY.md §5). Here the entire
``TrainState`` pytree (params + optimizer states + algorithm aux + step) and
the data RNG key are serialized, so resume is bit-exact.

Format: a single ``.npz`` with flattened leaves plus a JSON metadata entry.
The tree STRUCTURE is not serialized at all — the loader re-derives it from
a caller-provided template pytree (a freshly initialized TrainState), which
is version-stable and involves no pickle / arbitrary code execution. Under
multi-host data parallelism only process 0 writes (state is replicated).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

_META_KEY = "__ultra_meta__"


def save_checkpoint(path: str, tree: Any, metadata: dict = None) -> None:
    """Atomically write `tree`'s leaves + metadata to ``<path>.npz``.

    No-op on non-zero processes: under multi-host DP every host holds the
    same replicated state, so only process 0 writes (all hosts would
    otherwise race on the same file).
    """
    if jax.process_index() != 0:
        return
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays[_META_KEY] = np.array(json.dumps({
        "n": len(leaves),
        "metadata": metadata or {},
        # Human-readable structure fingerprint for mismatch diagnostics only.
        "structure": str(treedef),
    }))
    tmp = path + ".npz.tmp.npz"  # np.savez appends .npz if missing
    np.savez(tmp, **arrays)
    os.replace(tmp, path + ".npz")


def load_checkpoint(path: str, template: Any = None) -> Tuple[Any, dict]:
    """Load a checkpoint written by :func:`save_checkpoint`.

    Args:
      template: a pytree with the SAME structure as the saved one (e.g. the
        output of ``algorithm.init_state`` plus the data rng) — its treedef
        is used to unflatten the stored leaves. Required.
    """
    npz_path = path + ".npz"
    data = np.load(npz_path)
    if _META_KEY in data.files:
        meta = json.loads(str(data[_META_KEY]))
        n = meta["n"]
        leaves = [data[f"leaf_{i}"] for i in range(n)]
        if template is None:
            raise ValueError(
                f"checkpoint {npz_path} needs a template pytree to restore "
                "(pass the freshly initialized train state)")
        tpl_leaves, treedef = jax.tree_util.tree_flatten(template)
        if len(tpl_leaves) != n:
            raise ValueError(
                f"checkpoint {npz_path} has {n} leaves but the template has "
                f"{len(tpl_leaves)} — saved structure: {meta['structure']}")
        for i, (saved, tpl) in enumerate(zip(leaves, tpl_leaves)):
            tpl_shape = tuple(np.shape(tpl))
            if tuple(saved.shape) != tpl_shape:
                raise ValueError(
                    f"checkpoint leaf_{i} shape {tuple(saved.shape)} != "
                    f"template shape {tpl_shape}")
        return (jax.tree_util.tree_unflatten(treedef, leaves),
                meta.get("metadata", {}))
    raise ValueError(
        f"checkpoint {npz_path} has no {_META_KEY!r} entry — not a "
        "checkpoint this framework wrote (the pre-release pickle-sidecar "
        "format is no longer readable; no pickle is ever loaded)")


def load_params_prefix(path: str, params_template: Any) -> Any:
    """Restore ONLY the ranker params from a checkpoint, regardless of its
    optimizer-state layout version.

    ``TrainState`` flattens as (params, opt_state, aux, step) and the
    saved tree is ``(TrainState, rng)``, so the params leaves are always
    the FIRST ``len(params_leaves)`` stored leaves in template order —
    the r3->r4 optimizer flattening changed only the opt_state leaves
    after them. Every leaf is shape-checked against the template. Used by
    the --restore_params_only migration path (run/experiment.py): ranker
    weights carry over, optimizer/aux state start fresh.
    """
    data = np.load(path + ".npz")
    if _META_KEY not in data.files:
        raise ValueError(f"{path}.npz is not a framework checkpoint")
    tpl_leaves, treedef = jax.tree_util.tree_flatten(params_template)
    n_saved = json.loads(str(data[_META_KEY]))["n"]
    if n_saved < len(tpl_leaves):
        raise ValueError(
            f"checkpoint {path}.npz has {n_saved} leaves, fewer than the "
            f"{len(tpl_leaves)} params leaves of this model")
    leaves = []
    for i, tpl in enumerate(tpl_leaves):
        saved = data[f"leaf_{i}"]
        if tuple(saved.shape) != tuple(np.shape(tpl)):
            raise ValueError(
                f"checkpoint params leaf_{i} shape {tuple(saved.shape)} != "
                f"model shape {tuple(np.shape(tpl))} — different ranker "
                "architecture?")
        leaves.append(saved)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def read_metadata(path: str) -> dict:
    """Read only the JSON metadata of a checkpoint (no template needed)."""
    data = np.load(path + ".npz")
    if _META_KEY in data.files:
        return json.loads(str(data[_META_KEY])).get("metadata", {})
    return {}


def checkpoint_exists(path: str) -> bool:
    return os.path.isfile(path + ".npz")
