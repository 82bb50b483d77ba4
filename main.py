"""ULTRA-TPU driver CLI.

Flag-compatible with the reference's driver (ref ``main.py:24-62``):

    python main.py --data_dir=./tests/data/ --setting_file=... \
        --model_dir=./model/ --max_train_iteration=1000

Train loop semantics mirror ref ``main.py:151-223`` (periodic validation,
best-objective checkpointing, divergence stop); ``--test_only`` mirrors
ref ``main.py:230-292`` (metrics + TREC ranklist output).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

# Persistent compilation cache: TPU (remote) compilation can take minutes
# per program in some deployments; cached executables make reruns instant.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/ultra_tpu_jax"))

# Optional platform override (e.g. ULTRA_PLATFORM=cpu for local debugging);
# the deployment environment may register its TPU backend programmatically,
# so an env-var JAX_PLATFORMS override alone is not reliable.
if os.environ.get("ULTRA_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["ULTRA_PLATFORM"])

# Multi-host launch (tools/run_multihost.py, or a real multi-host TPU pod):
# ULTRA_COORDINATOR=host:port ULTRA_NUM_PROCESSES=N ULTRA_PROCESS_ID=i.
# Must run before any backend initialization. On TPU pods JAX normally
# auto-detects all three; the env vars cover CPU/manual launches.
if os.environ.get("ULTRA_COORDINATOR"):
    _missing = [v for v in ("ULTRA_NUM_PROCESSES", "ULTRA_PROCESS_ID")
                if v not in os.environ]
    if _missing:
        raise SystemExit(
            "ULTRA_COORDINATOR is set but %s %s missing: multi-host launch "
            "needs all of ULTRA_COORDINATOR, ULTRA_NUM_PROCESSES and "
            "ULTRA_PROCESS_ID (see tools/run_multihost.py). On TPU pods, "
            "unset ULTRA_COORDINATOR to let jax.distributed auto-detect."
            % (" and ".join(_missing), "is" if len(_missing) == 1 else "are"))
    jax.distributed.initialize(
        coordinator_address=os.environ["ULTRA_COORDINATOR"],
        num_processes=int(os.environ["ULTRA_NUM_PROCESSES"]),
        process_id=int(os.environ["ULTRA_PROCESS_ID"]))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ULTRA-TPU")
    p.add_argument("--data_dir", type=str, default="./tests/data/")
    p.add_argument("--train_data_prefix", type=str, default="train",
                   help="file prefix of the training split in data_dir")
    p.add_argument("--valid_data_prefix", type=str, default="valid")
    p.add_argument("--test_data_prefix", type=str, default="test")
    p.add_argument("--model_dir", type=str, default="./tmp_model/")
    p.add_argument("--output_dir", type=str, default="./tmp_output/")
    p.add_argument("--setting_file", type=str, default="./example/offline_setting/dla_exp_settings.json")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--data_format", type=str, default="ULTRA",
                   choices=["ULTRA", "ULTRE"])
    p.add_argument("--click_model_dir", type=str, default=None)
    p.add_argument("--max_list_cutoff", type=int, default=0,
                   help="0 = no cutoff on candidate lists")
    p.add_argument("--selection_bias_cutoff", type=int, default=10,
                   help="top-k positions subject to selection bias")
    p.add_argument("--max_train_iteration", type=int, default=10000)
    p.add_argument("--start_saving_iteration", type=int, default=0,
                   help="do not save checkpoints before this iteration "
                        "(ref main.py:51-53)")
    p.add_argument("--start_checkpoint", type=str, default="",
                   help="explicit checkpoint path to restore (train or "
                        "test); default: <model_dir>/<algo>.ckpt if present")
    p.add_argument("--steps_per_checkpoint", type=int, default=50)
    p.add_argument("--test_while_train", action="store_true")
    p.add_argument("--test_only", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", type=str, default="auto",
                   help="data parallelism: 'auto' (all devices when >1 and "
                        "batch_size divides), 'off', or a device count")
    p.add_argument("--shard_data", action="store_true",
                   help="shard the train feature table over the DP mesh "
                        "(device i holds query stripe i + only its feature "
                        "rows) — for tables too big to replicate per device")
    p.add_argument("--log_dir", type=str, default="",
                   help="TensorBoard/JSONL metric logs (default <model_dir>/logs)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="trace this many steps with jax.profiler at start")
    p.add_argument("--restore_params_only", action="store_true",
                   help="restore only the ranker weights from the "
                        "checkpoint (fresh optimizer/aux state) — the "
                        "migration path for checkpoints written under an "
                        "older optimizer-state layout")
    p.add_argument("--sync_readback", action="store_true",
                   help="fetch each window's metrics before dispatching "
                        "the next (default: pipeline one window deep so "
                        "device->host readback latency overlaps compute)")
    p.add_argument("--prng", type=str, default="threefry2x32",
                   choices=["threefry2x32", "rbg", "unsafe_rbg"],
                   help="JAX PRNG impl. 'rbg' uses the TPU hardware bit "
                        "generator (+25%% DLA throughput, BASELINE.md) but "
                        "its streams are not bit-stable across compiler "
                        "versions; the default keeps runs exactly "
                        "reproducible")
    return p.parse_args(argv)


def build_experiment(args, splits):
    from ultra_pytorch_tpu.run.experiment import Experiment

    with open(args.setting_file) as fin:
        exp_settings = json.load(fin)
    if args.selection_bias_cutoff > 0:
        exp_settings.setdefault("selection_bias_cutoff",
                                args.selection_bias_cutoff)
    if args.click_model_dir:
        exp_settings["click_model_dir"] = args.click_model_dir
    exp = Experiment(
        exp_settings, args.data_dir, args.model_dir,
        batch_size=args.batch_size, data_format=args.data_format,
        seed=args.seed,
        rank_cut=args.max_list_cutoff if args.max_list_cutoff > 0 else None,
        dp=args.dp,  # policy string coerced by Experiment.__init__
        shard_data=args.shard_data,
        split_prefixes={"train": args.train_data_prefix,
                        "valid": args.valid_data_prefix,
                        "test": args.test_data_prefix})
    exp.setup(splits=splits)
    if exp.mesh is not None:
        print(f"Data parallelism: {exp.mesh.devices.size}-device mesh "
              f"({jax.process_count()} host(s))")
    return exp


def train(args):
    from ultra_pytorch_tpu.utils.logging_utils import MetricLogger, profile_ctx

    splits = ("train", "valid", "test") if args.test_while_train else (
        "train", "valid")
    exp = build_experiment(args, splits=splits)
    exp.init_state()
    if exp.restore(args.start_checkpoint or None,
                   params_only=args.restore_params_only):
        what = "ranker params" if args.restore_params_only else "checkpoint"
        print(f"Restored {what} from "
              f"{args.start_checkpoint or exp.ckpt_path}")

    logger = MetricLogger(args.log_dir or os.path.join(args.model_dir, "logs"))
    objective = exp.exp_settings.get("objective_metric", "ndcg_10")
    best = None
    step = 0

    if args.profile_steps > 0:
        with profile_ctx(os.path.join(args.model_dir, "profile")):
            exp.train_steps(args.profile_steps)
        step += args.profile_steps

    # Pipelined window loop (default): each window's train metrics and
    # validation summary stay ON DEVICE until the NEXT window has been
    # dispatched, so the (tunnel-latency-bound, ~50 ms/round-trip here)
    # readback overlaps with device compute instead of serializing with
    # it. Checkpoint decisions use a device-side state snapshot taken at
    # the window boundary, so the saved state is exactly the one the
    # winning summary measured; prints/decisions lag one window behind
    # dispatch but are identical in content to the synchronous loop
    # (--sync_readback restores the strictly-ordered behavior).
    t_flush = [time.time()]

    def flush(entry):
        """Fetch one window's results (single combined transfer), print,
        log, decide checkpoint. Returns False on divergence."""
        nonlocal best
        metrics_h, summary_h, test_h = jax.device_get(
            (entry["metrics"], entry["summary"], entry["test"]))
        # Window rate = dispatch-to-fetch wall over the window; the stamp
        # is re-taken AFTER the save/log host work below so that work is
        # not billed to the NEXT window's rate.
        qps = (entry["window"] * args.batch_size
               / (time.time() - t_flush[0]))
        metrics = {k: float(v) for k, v in metrics_h.items()}
        summary = dict(zip(entry["keys"], map(float, summary_h)))
        at = entry["step"]
        obj = summary.get(objective)
        line = ", ".join(f"{k}={v:.5f}" for k, v in sorted(summary.items()))
        print(f"step {at} loss {metrics.get('loss', float('nan')):.5f} "
              f"({qps:.0f} queries/s) | {line}", flush=True)
        logger.log("train", at, dict(metrics, queries_per_sec=qps))
        logger.log("valid", at, summary)
        if test_h is not None:
            test_summary = dict(zip(entry["keys"], map(float, test_h)))
            logger.log("test", at, test_summary)
            print("  test: " + ", ".join(
                f"{k}={v:.5f}" for k, v in sorted(test_summary.items())))
        # Divergence check BEFORE the checkpoint decision: a window whose
        # mean loss went inf/nan must never overwrite the best checkpoint
        # (metrics over degenerate scores can still read as finite).
        loss = metrics.get("loss")
        diverged = loss is not None and (loss != loss
                                         or loss == float("inf"))
        # obj == obj guards NaN objectives from poisoning `best` (NaN
        # comparisons are False forever after, silently disabling saves).
        if (not diverged and obj is not None and obj == obj
                and (best is None or obj > best)
                and at >= args.start_saving_iteration):
            best = obj
            exp.save({"step": at, objective: obj},
                     state_and_rng=entry["snap"])
            print(f"  saved checkpoint ({objective}={obj:.5f})")
        t_flush[0] = time.time()
        if diverged:
            print("Divergence detected (loss inf/nan); stopping.")
            return False
        return True

    pending = None
    while step < args.max_train_iteration:
        window = min(args.steps_per_checkpoint,
                     args.max_train_iteration - step)
        metrics_dev = exp.train_steps_device(window)
        keys, summary_dev = exp.validate_device("valid")
        test_dev = (exp.validate_device("test")[1]
                    if args.test_while_train else None)
        entry = {"step": step + window, "window": window, "keys": keys,
                 "metrics": metrics_dev, "summary": summary_dev,
                 "test": test_dev,
                 # Sync mode flushes immediately, so the live state IS the
                 # window's end state — no device-side copy needed.
                 "snap": (None if args.sync_readback
                          else exp.snapshot_state())}
        step += window
        if args.sync_readback:
            if not flush(entry):
                break
            continue
        if pending is not None and not flush(pending):
            # The already-dispatched window trained FROM the diverged
            # state; never flush it (it could overwrite the best
            # checkpoint with post-divergence weights).
            pending = None
            break
        pending = entry
    if pending is not None:
        flush(pending)
    if best is None:
        exp.save({"step": step})
    logger.close()
    print(f"Training done at step {step}; best {objective}={best}")


def test(args):
    exp = build_experiment(args, splits=("test",))
    exp.init_state()
    if exp.restore(args.start_checkpoint or None,
                   params_only=args.restore_params_only):
        what = "ranker params" if args.restore_params_only else "checkpoint"
        print(f"Restored {what} from "
              f"{args.start_checkpoint or exp.ckpt_path}")
    else:
        print("WARNING: no checkpoint found; testing from random init")
    summary = exp.validate("test")
    for k in sorted(summary):
        print(f"{k}: {summary[k]:.5f}")
    os.makedirs(args.output_dir, exist_ok=True)
    path, _ = exp.write_ranklist("test", args.output_dir)
    print(f"Wrote {path}")


def main(argv=None):
    args = parse_args(argv)
    if args.prng != "threefry2x32":
        jax.config.update("jax_default_prng_impl", args.prng)
    os.makedirs(args.model_dir, exist_ok=True)
    if args.test_only:
        test(args)
    else:
        train(args)


if __name__ == "__main__":
    main()
