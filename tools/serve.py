"""Serve a trained checkpoint as a local HTTP ranking service.

Usage:
  python tools/serve.py --model_dir /path/to/model [--port 8000]
      [--host 127.0.0.1] [--setting_file settings.json]
      [--warmup_batch 64 --warmup_list 64]

The checkpoint embeds its model schema (Experiment.save), so
``--setting_file`` is only needed for pre-r2 checkpoints (or to override
ranker hparams). Then:

  curl -s localhost:8000/healthz
  curl -s -X POST localhost:8000/v1/rank -d \\
      '{"queries": [[[0.1, ...], [0.2, ...]]]}'

New capability — the reference toolbox has no serving path
(ref ``main.py:216-257`` stops at offline ranklist output).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compiled-program cache: serving buckets compile through the
# remote TPU compile service (minutes each, cheap after caching).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/ultra_tpu_jax"))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", required=True,
                   help="model dir (or .ckpt path) holding the checkpoint")
    p.add_argument("--setting_file", default=None,
                   help="optional experiment-settings JSON override")
    p.add_argument("--feature_size", type=int, default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--warmup_batch", type=int, default=0,
                   help="pre-compile buckets up to this batch size")
    p.add_argument("--warmup_list", type=int, default=0,
                   help="pre-compile buckets up to this list size")
    p.add_argument("--use_pallas", action="store_true", default=None,
                   help="force the fused Pallas MLP scoring kernel (DNN "
                   "only; default auto = on for DNN on TPU)")
    p.add_argument("--no_pallas", action="store_true",
                   help="force the plain XLA scoring path")
    p.add_argument("--no_batching", action="store_true",
                   help="disable request micro-batching (serve/batching.py)")
    args = p.parse_args(argv)

    if os.environ.get("ULTRA_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["ULTRA_PLATFORM"])

    from ultra_pytorch_tpu.serve import Scorer, serve

    settings = None
    if args.setting_file:
        with open(args.setting_file) as fin:
            settings = json.load(fin)
    use_pallas = False if args.no_pallas else args.use_pallas
    scorer = Scorer.from_checkpoint(args.model_dir, exp_settings=settings,
                                    feature_size=args.feature_size,
                                    use_pallas=use_pallas)
    serve(scorer, args.host, args.port,
          warmup_batch=args.warmup_batch, warmup_list=args.warmup_list,
          batch_requests=not args.no_batching)


if __name__ == "__main__":
    main()
