"""Per-feature min/max over train/test/valid -> feature_scale.json
(capability parity with ref ``libsvm_tools/extrac_feature_statistics.py``,
including the original's behavior that absent features count as 0.0).

Usage: python extract_feature_statistics.py <data_path>/
"""

import json
import sys

FILE_NAMES = ["train.txt", "test.txt", "valid.txt"]


def extract(data_path):
    n_features = 0
    rows = []
    for name in FILE_NAMES:
        with open(data_path + name) as fin:
            for line in fin:
                arr = line.split()
                fv = {}
                for tok in arr[2:]:
                    if ":" not in tok:
                        continue
                    idx_s, val_s = tok.split(":")
                    idx = int(idx_s) - 1
                    fv[idx] = float(val_s)
                    n_features = max(n_features, idx + 1)
                rows.append(fv)

    scale = [[0.0, 0.0] for _ in range(n_features)]
    first = [True] * n_features
    for fv in rows:
        for idx in range(n_features):
            v = fv.get(idx, 0.0)
            if first[idx]:
                scale[idx] = [v, v]
                first[idx] = False
            else:
                scale[idx][0] = min(scale[idx][0], v)
                scale[idx][1] = max(scale[idx][1], v)

    with open(data_path + "feature_scale.json", "w") as fout:
        json.dump(scale, fout)
    return scale


if __name__ == "__main__":
    extract(sys.argv[1])
