"""Join libsvm features with initial-ranker scores into the ULTRA format.

Capability parity with ref ``libsvm_tools/prepare_exp_data_with_svmrank.py``:
for each of train/test/valid, sorts each query's docs by the ranker's
``.predict`` scores and emits ``.feature`` / ``.init_list`` / ``.labels`` /
``.initial_scores`` plus TREC ``.qrels`` / ``.trec.init_list`` and a
top-level ``settings.json`` (feature_size + max_label).

Documented divergence: the reference writes 0-based feature indices
(ref ``:102-106``) that its OWN loader then shifts by -1 again
(ref ``data_utils.py:140``), silently dropping feature 0; we write 1-based
indices consistent with the loader.

Usage: python prepare_exp_data_with_rank.py <data_path> <predict_path> <out> <feature_size>
"""

from __future__ import annotations

import json
import os
import sys

SET_NAMES = ["train", "test", "valid"]


def prepare_one_set(feature_path, score_path, output_path, set_name, stats):
    qid_list = []
    data = {}  # qid -> list of (did, feature_tokens, label, score)
    line_num = 0
    with open(os.path.join(feature_path, set_name + ".txt")) as ffin, \
            open(os.path.join(score_path, set_name + ".predict")) as sfin:
        for feature_line, score_line in zip(ffin, sfin):
            arr = feature_line.split()
            if len(arr) < 3:
                continue
            label = float(arr[0])
            qid = arr[1].split(":")[1]
            if qid not in data:
                qid_list.append(qid)
                data[qid] = []
            did = f"{set_name}_{qid}_{line_num}"
            data[qid].append((did, arr[2:], label, float(score_line)))
            stats["max_label"] = max(stats["max_label"], label)
            line_num += 1

    os.makedirs(output_path, exist_ok=True)
    p = lambda ext: open(os.path.join(output_path, set_name + ext), "w")
    with p(".qrels") as qrels, p(".trec.init_list") as trec, \
            p(".feature") as feat, p(".init_list") as init, \
            p(".labels") as lab, p(".initial_scores") as scr:
        row = 0
        for qid in qid_list:
            docs = data[qid]
            order = sorted(range(len(docs)), key=lambda k: docs[k][3],
                           reverse=True)
            stats["lengths"].append(len(docs))
            for rank, idx in enumerate(order, start=1):
                did, _, _, score = docs[idx]
                trec.write(f"{qid} Q0 {did} {rank} {score} InitialRank\n")
            for did, _, label, _ in docs:
                qrels.write(f"{qid} 0 {did} {int(label)}\n")

            init.write(qid)
            lab.write(qid)
            scr.write(qid)
            for idx in order:
                did, tokens, label, score = docs[idx]
                init.write(f" {row}")
                lab.write(f" {label}")
                scr.write(f" {score}")
                feat.write(did + "".join(" " + t for t in tokens) + "\n")
                row += 1
            init.write("\n")
            lab.write("\n")
            scr.write("\n")


def main(data_path, predict_path, output_path, feature_size):
    stats = {"max_label": 0.0, "lengths": []}
    for set_name in SET_NAMES:
        prepare_one_set(data_path, predict_path,
                        os.path.join(output_path, set_name), set_name, stats)
    with open(os.path.join(output_path, "settings.json"), "w") as fout:
        json.dump({"feature_size": int(feature_size),
                   "max_label": stats["max_label"]}, fout)
    print("Longest list length %d" % max(stats["lengths"]))
    print("Average list length %d" %
          (sum(stats["lengths"]) / float(len(stats["lengths"]))))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]))
