"""Dataset ingestion: LETOR-style data -> fixed-shape device tensors.

Capability parity with the reference's ``Raw_data`` loader
(ref ``ultra/utils/data_utils.py:24-498``): reads the ULTRA format
(``<prefix>.feature`` sparse 1-based ``idx:val`` rows + ``.init_list`` +
``.labels`` + optional ``.initial_scores`` + ``settings.json``), the ULTRE
logged-click variant (doc-id-keyed features, optional click-model label
subdirectory), and raw libsvm ``label qid:X idx:val...`` files.

TPU-first design difference: instead of the reference's per-step host-side
feed-dict assembly (``ultra/input_layer/click_simulation_feed.py:122-163``,
re-built with numpy every batch), ingestion happens ONCE into

    features  [D+1, F]  float32  (row D is the zero PAD vector)
    doc_idx   [Q, L]    int32    (PAD positions point at row D)
    labels    [Q, L]    float32  (0 at pads)
    mask      [Q, L]    float32  (1 = real doc)

which live in HBM for the whole run; a training batch is a pure on-device
gather, so the sample -> simulate -> train path is a single jitted program.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

PAD_LABEL = -1.0


def _read_sparse_features(path: str, feature_size: int,
                          removed: List[int]) -> Tuple[List[str], np.ndarray]:
    """Read a `.feature` file of `did idx:val ...` rows (1-based idx).

    Uses the native C++ parser (ultra_pytorch_tpu/data/native.py) when
    available; the pure-Python path below is the fallback."""
    try:
        from ultra_pytorch_tpu.data import native
        if native.native_available():
            parsed = native.parse_letor_file(
                path, native.FORMAT_ULTRA, feature_size)
            if parsed is not None:
                feats, _, dids = parsed
                if removed:
                    keep = [i for i in range(feature_size)
                            if (i + 1) not in set(removed)]
                    feats = feats[:, keep]
                return dids, feats
    except Exception:
        pass
    dids: List[str] = []
    rows: List[np.ndarray] = []
    keep = None
    if removed:
        keep = np.array(
            [i for i in range(feature_size) if (i + 1) not in set(removed)],
            dtype=np.int64)
    with open(path) as fin:
        for line in fin:
            arr = line.split()
            if not arr:
                continue
            dids.append(arr[0])
            vec = np.zeros(feature_size, dtype=np.float32)
            for tok in arr[1:]:
                idx_s, val_s = tok.split(":")
                fi = int(idx_s) - 1
                if 0 <= fi < feature_size:
                    vec[fi] = float(val_s)
            rows.append(vec if keep is None else vec[keep])
    feats = (np.stack(rows) if rows
             else np.zeros((0, feature_size - len(removed)), np.float32))
    return dids, feats


def _read_indexed_lines(path: str, cast=float, rank_cut: Optional[int] = None
                        ) -> Tuple[List[str], List[List]]:
    keys, values = [], []
    with open(path) as fin:
        for line in fin:
            arr = line.split()
            if not arr:
                continue
            keys.append(arr[0])
            vals = [cast(x) for x in arr[1:]]
            if rank_cut is not None:
                vals = vals[:rank_cut]
            values.append(vals)
    return keys, values


@dataclasses.dataclass
class RankingDataset:
    """Host-side dataset with ragged lists densified to `rank_list_size`."""

    features: np.ndarray          # [D, F] float32 (no PAD row yet)
    initial_list: np.ndarray      # [Q, L] int64, -1 = pad
    labels: np.ndarray            # [Q, L] float32, 0 at pads
    qids: List[str]
    dids: List[str]
    feature_size: int
    rank_list_size: int
    max_label: float
    initial_scores: Optional[np.ndarray] = None  # [Q, L] float32
    initial_list_lengths: Optional[np.ndarray] = None  # [Q]

    def __post_init__(self):
        if self.initial_list_lengths is None:
            self.initial_list_lengths = (self.initial_list >= 0).sum(axis=1)

    @property
    def num_queries(self) -> int:
        return self.initial_list.shape[0]

    # -- padding ----------------------------------------------------------
    def pad(self, rank_list_size: int, pad_tails: bool = True) -> None:
        """Extend every list to `rank_list_size` with -1 sentinels
        (ref semantics: ``data_utils.py:476-498``; head padding supported
        via ``pad_tails=False``)."""
        q, cur = self.initial_list.shape
        if rank_list_size < cur:
            raise ValueError(
                f"pad({rank_list_size}) smaller than current width {cur}")
        if rank_list_size == cur:
            self.rank_list_size = rank_list_size
            return
        extra = rank_list_size - cur
        neg = -np.ones((q, extra), dtype=self.initial_list.dtype)
        zl = np.zeros((q, extra), dtype=self.labels.dtype)
        if pad_tails:
            self.initial_list = np.concatenate([self.initial_list, neg], 1)
            self.labels = np.concatenate([self.labels, zl], 1)
            if self.initial_scores is not None:
                self.initial_scores = np.concatenate(
                    [self.initial_scores, zl], 1)
        else:
            self.initial_list = np.concatenate([neg, self.initial_list], 1)
            self.labels = np.concatenate([zl, self.labels], 1)
            if self.initial_scores is not None:
                self.initial_scores = np.concatenate(
                    [zl, self.initial_scores], 1)
        self.rank_list_size = rank_list_size

    # -- device export ----------------------------------------------------
    def to_host_arrays(self, list_size: Optional[int] = None
                       ) -> Dict[str, np.ndarray]:
        """Densified numpy arrays in DeviceDataset layout (PAD row appended,
        pads remapped) — the staging step of `to_device`, also used by
        `parallel.host_stacked_dataset` for multi-host global assembly."""
        L = list_size or self.rank_list_size
        doc_idx = self.initial_list[:, :L].astype(np.int32)
        labels = self.labels[:, :L].astype(np.float32)
        mask = (doc_idx >= 0).astype(np.float32)
        d = self.features.shape[0]
        doc_idx = np.where(doc_idx >= 0, doc_idx, d)  # PAD -> zero row
        labels = labels * mask
        feats = np.concatenate(
            [self.features,
             np.zeros((1, self.features.shape[1]), np.float32)], 0)
        scores = (self.initial_scores[:, :L].astype(np.float32)
                  if self.initial_scores is not None
                  and self.initial_scores.shape[1] >= L
                  else np.zeros_like(labels))
        return {"features": feats, "doc_idx": doc_idx, "labels": labels,
                "mask": mask, "initial_scores": scores,
                "max_label": float(self.max_label)}

    def to_device(self, list_size: Optional[int] = None,
                  sharding=None) -> "DeviceDataset":
        """Export the dataset as device-resident arrays cut to `list_size`."""
        import jax.numpy as jnp
        import jax

        arrs = self.to_host_arrays(list_size)

        def put(x):
            if sharding is not None:
                return jax.device_put(x, sharding)
            return jnp.asarray(x)

        return DeviceDataset(
            features=put(arrs["features"]), doc_idx=put(arrs["doc_idx"]),
            labels=put(arrs["labels"]), mask=put(arrs["mask"]),
            initial_scores=put(arrs["initial_scores"]),
            max_label=arrs["max_label"])


@dataclasses.dataclass(frozen=True)
class DeviceDataset:
    """Device-resident dataset; a batch is `features[doc_idx[qs]]`."""

    features: "jax.Array"       # [D+1, F]  (last row zero PAD)
    doc_idx: "jax.Array"        # [Q, L] int32
    labels: "jax.Array"         # [Q, L] float32
    mask: "jax.Array"           # [Q, L] float32
    initial_scores: "jax.Array"  # [Q, L] float32
    max_label: float

    @property
    def num_queries(self) -> int:
        return self.doc_idx.shape[0]

    @property
    def list_size(self) -> int:
        return self.doc_idx.shape[1]

    @property
    def feature_size(self) -> int:
        return self.features.shape[1]

    def gather(self, query_indices, list_size: Optional[int] = None):
        """Pure on-device batch assembly: indices [B] -> batch dict.

        `list_size` cuts to the top-k of the initial list BEFORE the feature
        gather, so training at selection_bias_cutoff=10 only moves 10 rows
        per query through HBM even when lists are hundreds long."""
        idx = self.doc_idx[query_indices]           # [B, L]
        lb = self.labels[query_indices]
        mk = self.mask[query_indices]
        sc = self.initial_scores[query_indices]
        if list_size is not None and list_size < idx.shape[1]:
            idx = idx[:, :list_size]
            lb = lb[:, :list_size]
            mk = mk[:, :list_size]
            sc = sc[:, :list_size]
        return {
            "features": self.features[idx],          # [B, L, F]
            "labels": lb,
            "mask": mk,
            "initial_scores": sc,
        }


def _register_device_dataset_pytree():
    """DeviceDataset is a pytree so jitted programs take it as an ARGUMENT.

    Closing over the arrays instead would embed the whole feature table as
    a literal constant in the lowered HLO (hundreds of MB at MSLR/Yahoo
    scale — bloats or outright breaks compilation, and re-keys the
    compilation cache on every dataset change)."""
    import jax

    jax.tree_util.register_pytree_node(
        DeviceDataset,
        lambda d: ((d.features, d.doc_idx, d.labels, d.mask,
                    d.initial_scores), d.max_label),
        lambda max_label, xs: DeviceDataset(*xs, max_label=max_label),
    )


_register_device_dataset_pytree()


# -- format loaders -------------------------------------------------------

def _densify(lists: List[List[int]], labels: List[List[float]],
             scores: Optional[List[List[float]]], rank_list_size: int
             ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    q = len(lists)
    il = -np.ones((q, rank_list_size), dtype=np.int64)
    lb = np.zeros((q, rank_list_size), dtype=np.float32)
    sc = np.zeros((q, rank_list_size), dtype=np.float32) if scores else None
    for i, docs in enumerate(lists):
        n = len(docs)
        il[i, :n] = docs
        lb[i, :len(labels[i])] = labels[i][:rank_list_size]
        if sc is not None and i < len(scores) and scores[i]:
            s = scores[i][:rank_list_size]
            sc[i, :len(s)] = s
    return il, lb, sc


def _remove_invalid(qids, lists, labels, scores):
    """Drop queries with <2 docs or no positive labels
    (ref ``data_utils.py:367-422``)."""
    keep = [i for i in range(len(lists))
            if len(lists[i]) >= 2 and any(l > 0 for l in labels[i])]
    pick = lambda xs: [xs[i] for i in keep]
    return (pick(qids), pick(lists), pick(labels),
            pick(scores) if scores else scores)


def load_ultra_format(data_path: str, file_prefix: str,
                      rank_cut: Optional[int] = None) -> RankingDataset:
    """Load ULTRA-format data (ref ``data_utils.py:99-189``)."""
    settings = json.load(open(os.path.join(data_path, "settings.json")))
    feature_size = settings["feature_size"]
    max_label = float(settings.get("max_label", 1.0))
    removed = sorted(
        [i for i in settings.get("removed_feature_ids", []) if i <= feature_size])

    sub = os.path.join(data_path, file_prefix)
    dids, features = _read_sparse_features(
        os.path.join(sub, file_prefix + ".feature"), feature_size, removed)
    qids, lists = _read_indexed_lines(
        os.path.join(sub, file_prefix + ".init_list"), int, rank_cut)
    _, labels = _read_indexed_lines(
        os.path.join(sub, file_prefix + ".labels"), float, rank_cut)
    scores_path = os.path.join(sub, file_prefix + ".initial_scores")
    scores = None
    if os.path.isfile(scores_path):
        _, scores = _read_indexed_lines(scores_path, float, rank_cut)

    qids, lists, labels, scores = _remove_invalid(qids, lists, labels, scores)
    rank_list_size = max((len(l) for l in lists), default=0)
    il, lb, sc = _densify(lists, labels, scores, rank_list_size)
    return RankingDataset(
        features=features, initial_list=il, labels=lb, qids=qids, dids=dids,
        feature_size=feature_size - len(removed),
        rank_list_size=rank_list_size, max_label=max_label,
        initial_scores=sc)


def load_ultre_format(data_path: str, file_prefix: str,
                      click_model_dir: Optional[str] = None,
                      rank_cut: Optional[int] = None) -> RankingDataset:
    """Load ULTRE-format data (doc-id-keyed features, qid:did init lists,
    labels optionally replaced by logged clicks from `click_model_dir`;
    ref ``data_utils.py:191-285``)."""
    settings = json.load(open(os.path.join(data_path, "settings.json")))
    feature_size = settings["feature_size"]
    max_label = float(settings.get("max_label", 1.0))

    sub = os.path.join(data_path, file_prefix)
    raw_dids, features = _read_sparse_features(
        os.path.join(sub, file_prefix + ".feature"), feature_size, [])
    did_to_row: Dict[str, int] = {d: i for i, d in enumerate(raw_dids)}

    qids, str_lists = _read_indexed_lines(
        os.path.join(sub, file_prefix + ".init_list"), str, rank_cut)
    lists = [[did_to_row[d] for d in docs if d in did_to_row]
             for docs in str_lists]

    label_path = os.path.join(sub, file_prefix + ".labels")
    if click_model_dir:
        cand = os.path.join(click_model_dir, file_prefix + ".labels")
        if os.path.isfile(cand):
            label_path = cand
    _, labels = _read_indexed_lines(label_path, float, rank_cut)

    qids, lists, labels, _ = _remove_invalid(qids, lists, labels, None)
    rank_list_size = max((len(l) for l in lists), default=0)
    il, lb, _ = _densify(lists, labels, None, rank_list_size)
    return RankingDataset(
        features=features, initial_list=il, labels=lb, qids=qids,
        dids=raw_dids, feature_size=feature_size,
        rank_list_size=rank_list_size, max_label=max_label)


def _assemble_libsvm(features: np.ndarray, labels_flat: np.ndarray,
                     row_qids: List[str],
                     rank_cut: Optional[int] = None) -> RankingDataset:
    """Group natively-parsed libsvm rows (file order) into a dataset."""
    qids: List[str] = []
    lists: List[List[int]] = []
    labels: List[List[float]] = []
    dids: List[str] = []
    keep_rows: List[int] = []
    max_label = 1.0
    cur = None
    for row, qid in enumerate(row_qids):
        if qid != cur:
            qids.append(qid)
            lists.append([])
            labels.append([])
            cur = qid
        if rank_cut is not None and len(lists[-1]) >= rank_cut:
            continue
        lists[-1].append(len(keep_rows))
        lab = float(labels_flat[row])
        labels[-1].append(lab)
        max_label = max(max_label, lab)
        dids.append(f"{qid}_{len(lists[-1]) - 1}")
        keep_rows.append(row)
    feats = features[np.asarray(keep_rows, dtype=np.int64)] \
        if len(keep_rows) != features.shape[0] else features
    qids, lists, labels, _ = _remove_invalid(qids, lists, labels, None)
    rank_list_size = max((len(l) for l in lists), default=0)
    il, lb, _ = _densify(lists, labels, None, rank_list_size)
    return RankingDataset(
        features=feats, initial_list=il, labels=lb, qids=qids, dids=dids,
        feature_size=features.shape[1], rank_list_size=rank_list_size,
        max_label=max_label)


def load_libsvm_format(data_path: str, file_prefix: str,
                       rank_cut: Optional[int] = None) -> RankingDataset:
    """Load raw libsvm `label qid:X idx:val...` data in file order
    (ref ``data_utils.py:287-365``)."""
    path = os.path.join(data_path, file_prefix, file_prefix + ".txt")
    native_parsed = None
    try:
        from ultra_pytorch_tpu.data import native
        if native.native_available():
            native_parsed = native.parse_letor_file(
                path, native.FORMAT_LIBSVM, None)
    except Exception:
        native_parsed = None
    if native_parsed is not None:
        return _assemble_libsvm(*native_parsed, rank_cut=rank_cut)
    qids: List[str] = []
    lists: List[List[int]] = []
    labels: List[List[float]] = []
    dids: List[str] = []
    rows: List[np.ndarray] = []
    feature_size = 0
    pairs: List[Tuple[str, float, Dict[int, float]]] = []
    with open(path) as fin:
        for line in fin:
            toks = line.split()
            if not toks:
                continue
            label = float(toks[0])
            qid = toks[1].split(":")[1]
            fv = {}
            for tok in toks[2:]:
                if tok.startswith("#"):
                    break
                i_s, v_s = tok.split(":")
                fi = int(i_s)
                feature_size = max(feature_size, fi)
                fv[fi - 1] = float(v_s)
            pairs.append((qid, label, fv))

    cur_qid = None
    max_label = 1.0
    for qid, label, fv in pairs:
        vec = np.zeros(feature_size, dtype=np.float32)
        for k, v in fv.items():
            vec[k] = v
        if qid != cur_qid:
            qids.append(qid)
            lists.append([])
            labels.append([])
            cur_qid = qid
        if rank_cut is not None and len(lists[-1]) >= rank_cut:
            continue
        lists[-1].append(len(rows))
        labels[-1].append(label)
        max_label = max(max_label, label)
        dids.append(f"{qid}_{len(lists[-1]) - 1}")
        rows.append(vec)

    features = (np.stack(rows) if rows
                else np.zeros((0, feature_size), np.float32))
    qids, lists, labels, _ = _remove_invalid(qids, lists, labels, None)
    rank_list_size = max((len(l) for l in lists), default=0)
    il, lb, _ = _densify(lists, labels, None, rank_list_size)
    return RankingDataset(
        features=features, initial_list=il, labels=lb, qids=qids, dids=dids,
        feature_size=feature_size, rank_list_size=rank_list_size,
        max_label=max_label)


def read_data(data_path: str, file_prefix: str, rank_cut: Optional[int] = None,
              click_model_dir: Optional[str] = None) -> RankingDataset:
    """Format-autodetecting entry point (ref ``data_utils.py:54-62``):
    `.feature` present -> ULTRA (ULTRE if click_model_dir), else libsvm."""
    sub = os.path.join(data_path, file_prefix)
    if os.path.isfile(os.path.join(sub, file_prefix + ".feature")):
        if click_model_dir:
            return load_ultre_format(
                data_path, file_prefix, click_model_dir, rank_cut)
        return load_ultra_format(data_path, file_prefix, rank_cut)
    if os.path.isfile(os.path.join(sub, file_prefix + ".txt")):
        return load_libsvm_format(data_path, file_prefix, rank_cut)
    raise FileNotFoundError(
        f"No ULTRA (.feature) or libsvm (.txt) data under {sub}")


def merge_summary(summary_list: List[Dict[str, float]],
                  counts: List[int]) -> Dict[str, float]:
    """Weighted average of per-batch metric dicts
    (ref ``data_utils.py:501-514``)."""
    total = float(sum(counts))
    out: Dict[str, float] = {}
    for summary, c in zip(summary_list, counts):
        for k, v in summary.items():
            out[k] = out.get(k, 0.0) + float(v) * (c / total)
    return out
