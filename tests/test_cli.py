"""Subprocess-level CLI smoke test.

Drives ``python main.py`` end-to-end like the reference's whole test
strategy does (ref ``tests/pipeline_test/test_pipeline.py:22-75``): train a
few iterations with --test_while_train, assert the checkpoint exists, then
a --test_only run writes metrics + a TREC ``.ranklist``. Exercises the
arg plumbing, restore path, and auto-DP on the virtual CPU mesh.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env["ULTRA_PLATFORM"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py")] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, (
        f"CLI failed:\nSTDOUT:\n{proc.stdout}\nSTDERR:\n{proc.stderr}")
    return proc.stdout


def test_cli_train_then_test_only(toy_data_dir, click_model_json, tmp_path):
    settings = {
        "train_input_feed": "ClickSimulationFeed",
        "train_input_hparams": f"click_model_json={click_model_json}",
        "valid_input_feed": "DirectLabelFeed",
        "valid_input_hparams": "",
        "test_input_feed": "DirectLabelFeed",
        "test_input_hparams": "",
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[16]",
        "learning_algorithm": "DLA",
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg"],
        "metrics_topn": [5],
        "objective_metric": "ndcg_5",
        "selection_bias_cutoff": 5,
    }
    setting_file = tmp_path / "settings.json"
    setting_file.write_text(json.dumps(settings))
    model_dir = tmp_path / "model"
    out_dir = tmp_path / "out"

    stdout = _run([
        "--data_dir", toy_data_dir,
        "--setting_file", str(setting_file),
        "--model_dir", str(model_dir),
        "--batch_size", "16",
        "--max_train_iteration", "10",
        "--steps_per_checkpoint", "4",
        "--test_while_train",
    ], cwd=str(tmp_path))
    assert "Training done" in stdout
    assert "test:" in stdout  # --test_while_train printed test metrics
    assert os.path.isfile(model_dir / "DLA.ckpt.npz")

    stdout = _run([
        "--data_dir", toy_data_dir,
        "--setting_file", str(setting_file),
        "--model_dir", str(model_dir),
        "--output_dir", str(out_dir),
        "--test_only",
    ], cwd=str(tmp_path))
    assert "ndcg_5:" in stdout
    assert "WARNING: no checkpoint" not in stdout  # restore must succeed
    ranklist = out_dir / "test.ranklist"
    assert ranklist.is_file()
    # TREC format: qid Q0 did rank score model
    first = ranklist.read_text().splitlines()[0].split()
    assert len(first) == 6 and first[1] == "Q0"


def test_cli_data_prefix_and_start_saving(toy_data_dir, click_model_json,
                                          tmp_path):
    """--*_data_prefix remap splits; --start_saving_iteration suppresses
    early checkpoints (ref main.py:26-30,51-53)."""
    settings = {
        "train_input_feed": "ClickSimulationFeed",
        "train_input_hparams": f"click_model_json={click_model_json}",
        "valid_input_feed": "DirectLabelFeed",
        "valid_input_hparams": "",
        "test_input_feed": "DirectLabelFeed",
        "test_input_hparams": "",
        "ranking_model": "Linear",
        "ranking_model_hparams": "",
        "learning_algorithm": "NaiveAlgorithm",
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg"],
        "metrics_topn": [5],
        "objective_metric": "ndcg_5",
        "selection_bias_cutoff": 5,
    }
    setting_file = tmp_path / "settings.json"
    setting_file.write_text(json.dumps(settings))
    model_dir = tmp_path / "model"

    stdout = _run([
        "--data_dir", toy_data_dir,
        "--setting_file", str(setting_file),
        "--model_dir", str(model_dir),
        "--batch_size", "8",
        "--max_train_iteration", "8",
        "--steps_per_checkpoint", "4",
        # validation uses the TEST split via prefix remap
        "--valid_data_prefix", "test",
        "--start_saving_iteration", "6",
    ], cwd=str(tmp_path))
    assert "Training done" in stdout
    # windows end at steps 4 and 8; step 4 must NOT save (gate), step 8
    # MUST (best is still None there, so any finite objective saves)
    assert "step 4" in stdout and "step 8" in stdout
    saves = [ln for ln in stdout.splitlines() if "saved checkpoint" in ln]
    assert len(saves) == 1, stdout
    step8_onward = stdout[stdout.index("step 8"):]
    assert "saved checkpoint" in step8_onward

    # --start_checkpoint: explicit restore path into a FRESH model dir
    # (the flag was parsed-but-dead before r3).
    stdout = _run([
        "--data_dir", toy_data_dir,
        "--setting_file", str(setting_file),
        "--model_dir", str(tmp_path / "model2"),
        "--output_dir", str(tmp_path / "out2"),
        "--valid_data_prefix", "test",
        "--start_checkpoint", str(model_dir / "NaiveAlgorithm.ckpt"),
        "--test_only",
    ], cwd=str(tmp_path))
    assert "Restored checkpoint from" in stdout
    assert "WARNING: no checkpoint" not in stdout
    # A bogus explicit path must be a hard error, not a silent fresh start.
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"),
         "--data_dir", toy_data_dir,
         "--setting_file", str(setting_file),
         "--model_dir", str(tmp_path / "model3"),
         "--start_checkpoint", str(tmp_path / "nope.ckpt"),
         "--test_only"],
        cwd=str(tmp_path), env=dict(
            os.environ, ULTRA_PLATFORM="cpu"),
        capture_output=True, text=True, timeout=540)
    assert proc.returncode != 0
    assert "no checkpoint there" in proc.stderr


def test_offline_exp_pipeline_end_to_end(tmp_path):
    """Dry-run the MSLR_WEB10K offline pipeline wrapper end-to-end on
    generated libsvm data (VERDICT-r3 #9): clean -> normalize -> sample ->
    linear initial ranking -> ULTRA prep -> train -> test. Known-good if
    the real dataset is dropped into DATA_PATH."""
    import shutil

    from tools.make_toy_data import main as make_main

    raw = tmp_path / "raw"
    make_main([str(tmp_path / "gen"), "--queries", "30", "--features",
               "136", "--libsvm"])
    raw.mkdir()
    # pipeline expects a flat Fold-style dir: {train,vali,test}.txt
    shutil.copy(tmp_path / "gen" / "train" / "train.txt", raw / "train.txt")
    shutil.copy(tmp_path / "gen" / "valid" / "valid.txt", raw / "vali.txt")
    shutil.copy(tmp_path / "gen" / "test" / "test.txt", raw / "test.txt")

    work = tmp_path / "work"
    env = dict(os.environ)
    env.update({
        "ULTRA_PLATFORM": "cpu",
        "DATA_PATH": str(raw),
        "WORK": str(work),
        "MAX_ITER": "20",
        "BATCH": "8",
        "SETTING": "configs/naive.json",
    })
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "example", "MSLR_WEB10K",
                              "offline_exp_pipeline.sh")],
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"pipeline failed:\nSTDOUT:\n{proc.stdout[-3000:]}\n"
        f"STDERR:\n{proc.stderr[-3000:]}")
    # ULTRA-format prep output
    for f in ("settings.json", "train/train.feature", "train/train.labels",
              "train/train.init_list", "train/train.initial_scores"):
        assert (work / "prep" / f).exists(), f
    # TREC output from the --test_only leg
    ranklist = work / "out" / "test.ranklist"
    assert ranklist.exists()
    assert len(ranklist.read_text().splitlines()) > 0


def test_pipelined_and_sync_readback_agree(toy_data_dir, click_model_json,
                                           tmp_path):
    """The default one-window-deep pipelined loop must produce the SAME
    per-window metrics and checkpoint decisions as --sync_readback — the
    pipeline only changes WHEN results are fetched, never their values
    (snapshot-based checkpointing, host-side eval-rng step mirror)."""
    settings = {
        "train_input_feed": "ClickSimulationFeed",
        "train_input_hparams": f"click_model_json={click_model_json}",
        "valid_input_feed": "DirectLabelFeed",
        "valid_input_hparams": "",
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[16]",
        "learning_algorithm": "DLA",
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg", "mrr"],
        "metrics_topn": [5],
        "objective_metric": "ndcg_5",
        "selection_bias_cutoff": 5,
    }
    setting_file = tmp_path / "settings.json"
    setting_file.write_text(json.dumps(settings))

    logs = {}
    for mode, extra in (("async", []), ("sync", ["--sync_readback"])):
        model_dir = tmp_path / f"model_{mode}"
        _run(["--data_dir", toy_data_dir,
              "--setting_file", str(setting_file),
              "--model_dir", str(model_dir),
              "--batch_size", "16",
              "--max_train_iteration", "25",
              "--steps_per_checkpoint", "10",   # uneven tail window
              "--dp", "off",
              "--seed", "7"] + extra, cwd=str(tmp_path))
        with open(model_dir / "logs" / "metrics.jsonl") as fin:
            entries = [json.loads(line) for line in fin]
        logs[mode] = {
            (e["split"], e["step"], k): v
            for e in entries for k, v in e.items()
            # wall-clock keys differ by design; compare metric values only
            if k not in ("split", "step", "time", "queries_per_sec")}
        assert (model_dir / "DLA.ckpt.npz").exists()

    assert set(logs["async"]) == set(logs["sync"])
    for key, v in logs["async"].items():
        assert abs(v - logs["sync"][key]) < 1e-6, (key, v, logs["sync"][key])
