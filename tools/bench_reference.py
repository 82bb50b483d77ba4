"""Measure the reference ULTRA_pytorch DLA training throughput.

Times the reference's own hot loop (feed.get_batch -> DLA.train) on its
bundled toy dataset with the benchmark protocol (batch 256, cutoff 10,
DNN [512, 256, 128], PBM eta=1.0). Result goes into BASELINE.md and
bench.py's REFERENCE_QPS.

Usage: python tools/bench_reference.py [/root/reference] [steps]
Runs from a writable temp cwd (the reference writes ./runs logs).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import tempfile
import time


def main(ref_path="/root/reference", steps=50):
    steps = int(steps)
    tmp = tempfile.mkdtemp(prefix="refbench_")
    os.chdir(tmp)
    os.symlink(os.path.join(ref_path, "example"),
               os.path.join(tmp, "example"))
    sys.path.insert(0, ref_path)

    import numpy as np
    import torch

    import ultra.utils.data_utils as data_utils
    from ultra.input_layer.click_simulation_feed import ClickSimulationFeed
    from ultra.learning_algorithm.base_algorithm import BaseAlgorithm
    from ultra.learning_algorithm.dla import DLA

    # Compat shim: the reference's feed emits float32 docid arrays
    # (click_simulation_feed.py:145) which current torch refuses to cast to
    # int64 in create_input_feed (base_algorithm.py:186). Patch ONLY the
    # cast so the unmodified hot loop can run; identical per-step work.
    _orig = BaseAlgorithm.create_input_feed

    def _patched(self, input_feed, list_size):
        self.labels = []
        self.docid_inputs = []
        self.letor_features = input_feed["letor_features"]
        for i in range(list_size):
            self.docid_inputs.append(
                np.asarray(input_feed[self.docid_inputs_name[i]],
                           dtype=np.int64))
            self.labels.append(input_feed[self.labels_name[i]])
        self.labels = torch.from_numpy(np.transpose(np.asarray(self.labels)))
        if self.is_cuda_avail:
            self.labels = self.labels.to(device=self.cuda)
        self.docid_inputs = torch.as_tensor(
            np.asarray(self.docid_inputs), dtype=torch.int64)

    BaseAlgorithm.create_input_feed = _patched

    data = data_utils.read_data(
        os.path.join(ref_path, "tests/data/"), "train", None)
    exp_settings = {
        "train_input_feed": "ultra.input_layer.ClickSimulationFeed",
        "train_input_hparams": "",
        "ranking_model": "ultra.ranking_model.DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[512, 256, 128]",
        "learning_algorithm": "ultra.learning_algorithm.DLA",
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg"],
        "metrics_topn": [10],
        "max_candidate_num": data.rank_list_size,
        "selection_bias_cutoff": min(10, data.rank_list_size),
    }
    data.pad(data.rank_list_size)

    model = DLA(data, exp_settings)
    feed = ClickSimulationFeed(model, 256, "")

    sink = io.StringIO()
    with contextlib.redirect_stdout(sink):
        for _ in range(5):  # warmup
            input_feed, _ = feed.get_batch(data, check_validation=True)
            model.train(input_feed)
        t0 = time.perf_counter()
        for _ in range(steps):
            input_feed, _ = feed.get_batch(data, check_validation=True)
            model.train(input_feed)
        dt = time.perf_counter() - t0

    qps = steps * 256 / dt
    print(f"reference DLA/DNN throughput: {qps:.1f} queries/s "
          f"({dt / steps * 1000:.1f} ms/step, {steps} steps)")


if __name__ == "__main__":
    main(*sys.argv[1:])
