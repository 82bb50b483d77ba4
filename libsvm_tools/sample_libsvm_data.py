"""Query-level sampling of a libsvm file (capability parity with ref
``libsvm_tools/sample_libsvm_data.py``; used to carve out the 1% initial-
ranker training split).

Usage: python sample_libsvm_data.py <input> <output> <sample_rate> [seed]
"""

import random
import sys
from collections import OrderedDict


def sample(input_file, output_file, sample_rate, seed=None):
    if seed is not None:
        random.seed(seed)
    qid_lines = OrderedDict()
    with open(input_file) as fin:
        for line in fin:
            arr = line.split()
            if not arr:
                continue
            qid = int(arr[1].split(":")[1])
            qid_lines.setdefault(qid, []).append(line.rstrip("\n"))

    k = max(int(sample_rate * len(qid_lines)), 1)
    picked = random.sample(list(qid_lines.items()), k)
    with open(output_file, "w") as fout:
        for qid, lines in sorted(picked, key=lambda kv: kv[0]):
            for line in lines:
                fout.write(line + "\n")


if __name__ == "__main__":
    sample(sys.argv[1], sys.argv[2], float(sys.argv[3]),
           int(sys.argv[4]) if len(sys.argv) > 4 else None)
