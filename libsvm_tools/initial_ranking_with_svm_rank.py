"""Produce initial rankings with an external SVMrank binary (capability
parity with ref ``libsvm_tools/initial_ranking_with_svm_rank.py``: train
svm_rank_learn -c 200, then classify train/valid/test into .predict files).

If no SVMrank installation is available (the common case on TPU hosts),
use ``initial_ranking_with_linear.py`` instead — it trains this framework's
own Linear ranker and writes the same ``.predict`` files.

Usage: python initial_ranking_with_svm_rank.py <svmrank_dir>/ <train> <valid> <test> <out>/
"""

import os
import subprocess
import sys


def run(svm_rank_path, train_file, valid_file, test_file, output_path):
    os.makedirs(output_path, exist_ok=True)
    model = os.path.join(output_path, "model.dat")
    subprocess.run([os.path.join(svm_rank_path, "svm_rank_learn"),
                    "-c", "200", train_file, model], check=True)
    for split, path in (("train", train_file), ("valid", valid_file),
                        ("test", test_file)):
        subprocess.run([os.path.join(svm_rank_path, "svm_rank_classify"),
                        path, model,
                        os.path.join(output_path, split + ".predict")],
                       check=True)


if __name__ == "__main__":
    run(*sys.argv[1:6])
