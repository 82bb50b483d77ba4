"""Full-train-state checkpointing.

The reference checkpoints only the ranker's weights (``torch.save(
model.model.state_dict())``, ref ``main.py:198-214``) — DLA's propensity
tower, Regression-EM's propensity vector, PairwiseDebias' t+/t-, optimizer
accumulators and RNG are all lost on resume (SURVEY.md §5). Here the entire
``TrainState`` pytree (params + optimizer states + algorithm aux + step) and
the data RNG key are serialized, so resume is bit-exact.

Format: a single ``.npz`` with flattened leaves plus a pickled treedef
sidecar — no external checkpoint service needed, works on any filesystem.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Tuple

import jax
import numpy as np


def save_checkpoint(path: str, tree: Any, metadata: dict = None) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    np.savez(path + ".npz", **arrays)
    with open(path + ".tree", "wb") as fout:
        pickle.dump({"treedef": treedef, "n": len(leaves),
                     "metadata": metadata or {}}, fout)


def load_checkpoint(path: str) -> Tuple[Any, dict]:
    with open(path + ".tree", "rb") as fin:
        meta = pickle.load(fin)
    data = np.load(path + ".npz")
    leaves = [data[f"leaf_{i}"] for i in range(meta["n"])]
    tree = jax.tree_util.tree_unflatten(meta["treedef"], leaves)
    return tree, meta.get("metadata", {})


def checkpoint_exists(path: str) -> bool:
    return os.path.isfile(path + ".npz") and os.path.isfile(path + ".tree")
