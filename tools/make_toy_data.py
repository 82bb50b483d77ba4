"""Generate a deterministic synthetic toy dataset in ULTRA format.

Produces the same file layout the reference's toy fixture uses
(ref ``tests/data/``: ``<prefix>.feature`` sparse 1-based idx:val rows,
``.init_list``, ``.labels``, ``.initial_scores``, ``settings.json``) plus a
libsvm twin (``example-style <prefix>.txt``), from a seeded RNG — nothing is
copied from the reference.

Usage: python tools/make_toy_data.py [out_dir] [--queries N] [--features F]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def make_split(rng: np.random.Generator, out_dir: str, prefix: str,
               num_queries: int, feature_size: int, max_label: int,
               min_docs: int = 3, max_docs: int = 9,
               libsvm: bool = False) -> None:
    sub = os.path.join(out_dir, prefix)
    os.makedirs(sub, exist_ok=True)
    f_feat = open(os.path.join(sub, prefix + ".feature"), "w")
    f_init = open(os.path.join(sub, prefix + ".init_list"), "w")
    f_lab = open(os.path.join(sub, prefix + ".labels"), "w")
    f_scr = open(os.path.join(sub, prefix + ".initial_scores"), "w")
    f_svm = open(os.path.join(sub, prefix + ".txt"), "w") if libsvm else None

    # A hidden linear scoring vector makes labels learnable from features.
    w_true = rng.normal(size=feature_size)

    row = 0
    for q in range(1, num_queries + 1):
        n_docs = int(rng.integers(min_docs, max_docs + 1))
        rows, labels, scores = [], [], []
        for d in range(n_docs):
            nnz = int(rng.integers(10, 25))
            idxs = np.sort(rng.choice(feature_size, size=nnz, replace=False))
            vals = np.round(rng.uniform(-1, 1, size=nnz), 6)
            vec = np.zeros(feature_size)
            vec[idxs] = vals
            raw = vec @ w_true + rng.normal() * 0.5
            labels.append(raw)
            scores.append(raw + rng.normal() * 0.2)
            did = f"{prefix}_{q}_{d}"
            toks = " ".join(f"{i + 1}:{v}" for i, v in zip(idxs, vals))
            f_feat.write(f"{did} {toks}\n")
            rows.append((row, did, idxs, vals))
            row += 1
        # Grade labels into 0..max_label by within-query quantiles.
        order = np.argsort(labels)
        grades = np.zeros(n_docs)
        for rank, j in enumerate(order):
            grades[j] = min(max_label, rank * (max_label + 1) // n_docs)
        if grades.max() == 0:
            grades[order[-1]] = max_label
        # Initial list: sorted by noisy initial scores descending.
        init_order = np.argsort(-np.asarray(scores))
        f_init.write(f"{q} " + " ".join(
            str(rows[j][0]) for j in init_order) + "\n")
        f_lab.write(f"{q} " + " ".join(
            str(float(grades[j])) for j in init_order) + "\n")
        f_scr.write(f"{q} " + " ".join(
            f"{scores[j]:.6f}" for j in init_order) + "\n")
        if f_svm is not None:
            for j in init_order:
                _, _, idxs, vals = rows[j]
                toks = " ".join(f"{i + 1}:{v}" for i, v in zip(idxs, vals))
                f_svm.write(f"{int(grades[j])} qid:{q} {toks}\n")

    for f in (f_feat, f_init, f_lab, f_scr, f_svm):
        if f is not None:
            f.close()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("out_dir", nargs="?", default="tests/data")
    p.add_argument("--queries", type=int, default=30)
    p.add_argument("--valid_queries", type=int, default=None,
                   help="valid/test split size (default: same as --queries)")
    p.add_argument("--features", type=int, default=136)
    p.add_argument("--max_label", type=int, default=2)
    p.add_argument("--min_docs", type=int, default=3)
    p.add_argument("--max_docs", type=int, default=9)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--libsvm", action="store_true")
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "settings.json"), "w") as fout:
        json.dump({"feature_size": args.features,
                   "max_label": float(args.max_label)}, fout)
    for i, prefix in enumerate(("train", "valid", "test")):
        n = args.queries if prefix == "train" else (
            args.valid_queries if args.valid_queries is not None
            else args.queries)
        make_split(np.random.default_rng(args.seed + i), args.out_dir, prefix,
                   n, args.features, args.max_label,
                   min_docs=args.min_docs, max_docs=args.max_docs,
                   libsvm=args.libsvm)
    print(f"Wrote toy dataset to {args.out_dir}")


if __name__ == "__main__":
    main()
