"""Split a libsvm file into valid/train by query (capability parity with
ref ``libsvm_tools/split_libsvm_data.py``).

Usage: python split_libsvm_data.py <input> <valid_out> <train_out> <rate> [seed]
"""

import random
import sys
from collections import OrderedDict


def split(input_file, valid_file, train_file, sample_rate, seed=None):
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

    items = list(qid_lines.items())
    random.shuffle(items)
    n_valid = max(int(sample_rate * len(items)), 1)

    def write(path, chunk):
        with open(path, "w") as fout:
            for qid, lines in sorted(chunk, key=lambda kv: kv[0]):
                for line in lines:
                    fout.write(line + "\n")

    write(valid_file, items[:n_valid])
    write(train_file, items[n_valid:])


if __name__ == "__main__":
    split(sys.argv[1], sys.argv[2], sys.argv[3], float(sys.argv[4]),
          int(sys.argv[5]) if len(sys.argv) > 5 else None)
