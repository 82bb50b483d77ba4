"""Rescale features to [-1, 1], linearly or log10 (for heavy-tailed data
like Istella; capability parity with ref
``libsvm_tools/normalize_feature.py:9-26``), sorting lines by qid and
densifying every feature index.

Usage: python normalize_feature.py <feature_scale.json> <input> <output> [log]
"""

import json
import math
import sys


def normalize(scale_file, feature_file, output_file, mode="linear"):
    func = (lambda x: math.log10(x + 1)) if mode == "log" else (lambda x: x)
    with open(scale_file) as fin:
        scale = json.load(fin)
    n = len(scale)

    def process(value, lo_hi):
        lo, hi = lo_hi
        value = value - lo
        top = func(hi - lo)
        if top > 0:
            result = func(value) / top * 2 - 1
        else:
            result = func(value)
        return float(f"{result:.6g}")

    lines = []
    with open(feature_file) as fin:
        for line in fin:
            arr = line.split()
            if not arr:
                continue
            qid = int(arr[1].split(":")[1])
            lines.append((qid, arr))
    lines.sort(key=lambda kv: kv[0])

    with open(output_file, "w") as fout:
        for _, arr in lines:
            dense = [0.0] * n
            for tok in arr[2:]:
                if ":" not in tok:
                    continue
                idx_s, val_s = tok.split(":")
                idx = int(idx_s) - 1
                if idx < n:
                    dense[idx] = process(float(val_s), scale[idx])
            fout.write(arr[0] + " " + arr[1] + "".join(
                f" {i + 1}:{dense[i]}" for i in range(n)) + "\n")


if __name__ == "__main__":
    normalize(sys.argv[1], sys.argv[2], sys.argv[3],
              sys.argv[4] if len(sys.argv) > 4 else "linear")
