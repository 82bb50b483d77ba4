"""Sort features by id per line, group by qid, optionally drop queries
with no positive labels (capability parity with ref
``libsvm_tools/clean_libsvm_file.py``).

Usage: python clean_libsvm_file.py <input> <output> <ignore_no_positive 0|1>
"""

import sys
from collections import OrderedDict


def clean(input_file, output_file, ignore_no_positive):
    qid_lines = OrderedDict()
    qid_label_sum = {}
    with open(input_file) as fin:
        for line in fin:
            arr = line.split()
            if not arr:
                continue
            label = int(float(arr[0]))
            qid = int(arr[1].split(":")[1])
            feats = sorted(
                ((int(tok.split(":")[0]), tok) for tok in arr[2:]
                 if ":" in tok), key=lambda kv: kv[0])
            qid_lines.setdefault(qid, []).append(
                " ".join([arr[0], arr[1]] + [t for _, t in feats]))
            qid_label_sum[qid] = qid_label_sum.get(qid, 0) + label

    with open(output_file, "w") as fout:
        for qid in sorted(qid_lines):
            if ignore_no_positive and qid_label_sum[qid] < 1:
                continue
            for line in qid_lines[qid]:
                fout.write(line + "\n")


if __name__ == "__main__":
    clean(sys.argv[1], sys.argv[2], bool(int(sys.argv[3])))
