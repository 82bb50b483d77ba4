"""Convergence comparison: reference ULTRA_pytorch vs this framework.

Trains the reference's algorithm (torch, CPU, with the same one-line cast
shim as tools/bench_reference.py) and ours (TPU or CPU) on the SAME
synthetic ULTRA-format dataset with the benchmark protocol, evaluating
valid-split nDCG@k with EACH side's own metric stack (the stacks themselves
are parity-tested in tests/test_metrics.py). Results land in BASELINE.md.

Usage:
  python tools/make_toy_data.py /tmp/conv_data --queries 400
  python tools/compare_convergence.py ref /tmp/conv_data <steps> [ALGO]
  python tools/compare_convergence.py ours /tmp/conv_data <steps> [ALGO]

ALGO is one of DLA (default), IPWrank, RegressionEM, PairDebias, PDGD,
DBGD — the five VERDICT-r1 parity targets use the reference's offline
experiment settings (example/offline_setting/*_exp_settings.json:
ClickSimulationFeed + DNN [512,256,128] + default algorithm hparams).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

# Persistent compiled-program cache (remote TPU compiles cost minutes;
# main.py/bench.py default this too). Must be set before jax imports.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/ultra_tpu_jax"))

# Our registry name -> reference class name (ultra.learning_algorithm.*).
ALGOS = {
    "DLA": "DLA",
    "IPWrank": "IPWrank",
    "RegressionEM": "RegressionEM",
    "PairDebias": "PairDebias",
    "PDGD": "PDGD",
    "DBGD": "DBGD",
    "MGD": "MGD",
    "NSGD": "NSGD",
    "NaiveAlgorithm": "NavieAlgorithm",  # [sic] reference typo
    "LambdaRank": "LambdaRank",
    "PRSrank": "PRSrank",
}


def run_reference(data_dir, steps, algo="DLA", ref_path="/root/reference"):
    import tempfile

    tmp = tempfile.mkdtemp(prefix="refconv_")
    os.chdir(tmp)
    os.symlink(os.path.join(ref_path, "example"),
               os.path.join(tmp, "example"))
    sys.path.insert(0, ref_path)

    import random

    import numpy as np
    import torch

    import ultra.utils.data_utils as data_utils
    from ultra.input_layer.click_simulation_feed import ClickSimulationFeed
    from ultra.input_layer.direct_label_feed import DirectLabelFeed
    from ultra.learning_algorithm.base_algorithm import BaseAlgorithm
    from ultra.utils.sys_tools import find_class

    seed = int(os.environ.get("ULTRA_CONV_SEED", "0"))
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)

    def _patched(self, input_feed, list_size):
        self.labels = []
        self.docid_inputs = []
        self.letor_features = input_feed["letor_features"]
        for i in range(list_size):
            self.docid_inputs.append(np.asarray(
                input_feed[self.docid_inputs_name[i]], dtype=np.int64))
            self.labels.append(input_feed[self.labels_name[i]])
        self.labels = torch.from_numpy(np.transpose(np.asarray(self.labels)))
        if self.is_cuda_avail:
            self.labels = self.labels.to(device=self.cuda)
        self.docid_inputs = torch.as_tensor(
            np.asarray(self.docid_inputs), dtype=torch.int64)

    BaseAlgorithm.create_input_feed = _patched

    # Second current-torch shim: the reference calls
    # nn.utils.clip_grad_value_ on LABEL tensors (which never have grads —
    # a semantic no-op, e.g. ipw_rank.py:164, regression_EM.py:181);
    # torch>=2 raises on the resulting empty grad list instead of ignoring
    # it. Skip the call when nothing has a grad; unchanged otherwise.
    _orig_clip_value = torch.nn.utils.clip_grad_value_

    def _safe_clip_value(parameters, clip_value, **kw):
        params = list(parameters) if not torch.is_tensor(parameters) \
            else [parameters]
        if not any(p.grad is not None for p in params):
            return
        return _orig_clip_value(params, clip_value, **kw)

    torch.nn.utils.clip_grad_value_ = _safe_clip_value

    # Third shim: the reference's DBGD/MGD/NSGD call
    # make_ranking_metric_fn('ndcg', rank_list_size) with an INT topn
    # (dbgd.py:129-131) but _prepare_and_validate_params iterates topn
    # (metrics.py:249) — DBGD-family training crashes out of the box (the
    # reference's own pipeline tests never ran; SURVEY.md §4). Wrap int
    # topn into a one-element list, which preserves the intended value.
    import ultra.utils as uutils

    _orig_make_metric = uutils.make_ranking_metric_fn

    def _make_metric(metric_key, topn, *a, **kw):
        if isinstance(topn, int):
            topn = [topn]
        return _orig_make_metric(metric_key, topn, *a, **kw)

    uutils.make_ranking_metric_fn = _make_metric

    train = data_utils.read_data(data_dir + "/", "train", None)
    valid = data_utils.read_data(data_dir + "/", "valid", None)
    max_candidate = max(train.rank_list_size, valid.rank_list_size)
    ranker = os.environ.get("ULTRA_CONV_RANKER", "DNN")
    if ranker not in ("DNN", "Linear"):
        # Eighth shim: SetRank is commented out of the reference's
        # ultra/ranking_model/__init__.py (:8), so find_class — and with
        # it the reference's own dla_SetRank_exp_settings.json — crashes
        # with "Class SetRank cannot be found" out of the box. Import the
        # module file and graft the class attribute onto the package.
        import importlib

        import ultra.ranking_model as _rm
        if not hasattr(_rm, ranker):
            _mod = importlib.import_module(f"ultra.ranking_model.{ranker}")
            setattr(_rm, ranker, getattr(_mod, ranker))
    # ULTRA_CONV_CLICK_JSON selects the click model for the simulation feed
    # (default: the feed's own PBM default). Used for the UBM/cascade
    # at-scale head-to-heads (VERDICT-r4 #4); pass an absolute path so both
    # sides read the SAME table file.
    click_json = os.environ.get("ULTRA_CONV_CLICK_JSON", "")
    exp_settings = {
        "train_input_feed": "ultra.input_layer.ClickSimulationFeed",
        "train_input_hparams":
            (f"click_model_json={click_json}" if click_json else ""),
        "ranking_model": f"ultra.ranking_model.{ranker}",
        "ranking_model_hparams": ("hidden_layer_sizes=[512, 256, 128]"
                                  if ranker == "DNN" else ""),
        "learning_algorithm": f"ultra.learning_algorithm.{ALGOS[algo]}",
        "learning_algorithm_hparams": "",
        "metrics": ["ndcg", "mrr"],
        "metrics_topn": [3, 5, 10],
        "max_candidate_num": max_candidate,
        "selection_bias_cutoff": min(10, max_candidate),
    }
    train.pad(max_candidate)
    valid.pad(max_candidate)

    algo_cls = find_class(exp_settings["learning_algorithm"])
    # MGD.__init__ reads self.is_cuda_avail without ever assigning it
    # (mgd.py:59) — crashes at construction; provide it as a class default.
    algo_cls.is_cuda_avail = torch.cuda.is_available()
    with contextlib.redirect_stdout(io.StringIO()):
        model = algo_cls(train, exp_settings)
    # Fourth shim: the reference DBGD's default Stochastic-interleave path
    # reads self.hparams.tau (dbgd.py:268) but never declares it (:46-55)
    # — out-of-the-box DBGD crashes. Declare the conventional 1.0.
    if not hasattr(model.hparams, "tau"):
        model.hparams.add_hparam("tau", 1.0)
    # Sixth shim: MGD/NSGD call click_simulation_winners(input_feed,
    # output) (mgd.py:142, nsgd.py:167) but DBGD defines it with a third
    # required interleave_strategy arg (dbgd.py:248) — crashes out of the
    # box; default to the model's configured strategy.
    if hasattr(model, "click_simulation_winners"):
        _orig_csw = model.click_simulation_winners

        def _csw(input_feed, rankers_output, interleave_strategy=None):
            # MGD passes its grad-carrying base output into the numpy
            # Plackett-Luce sampler (mgd.py:140-142 -> dbgd.py:268), which
            # torch rejects; detaching is semantically neutral here.
            rankers_output = [
                o.detach() if hasattr(o, "detach") else o
                for o in rankers_output]
            return _orig_csw(
                input_feed, rankers_output,
                interleave_strategy
                or getattr(model, "interleaving_strategy", "Stochastic"))

        model.click_simulation_winners = _csw
    # Also MGD.__init__ never builds the interleaving machinery its
    # need_interleave=True default requires (DBGD does at dbgd.py:99-104;
    # MGD overrides __init__ without it) — another unconditional crash.
    if (getattr(model.hparams, "need_interleave", False)
            and not hasattr(model, "interleaving")):
        from ultra.utils.team_draft_interleave import TeamDraftInterleaving
        import ultra.utils.click_models as ref_cm

        model.interleaving = TeamDraftInterleaving()
        model.MAX_SAMPLE_ROUND_NUM = 100
        if getattr(model, "click_model", None) is None:
            # MGD's HParams also omit click_model_json (DBGD declares it,
            # dbgd.py:48); use the reference's bundled PBM.
            cmj = getattr(model.hparams, "click_model_json",
                          "./example/ClickModel/pbm_0.1_1.0_4_1.0.json")
            with open(cmj) as fin:
                model.click_model = ref_cm.loadModelFromJson(json.load(fin))

    # Seventh shim (MGD only): MGD.train slices labels as [list, batch]
    # (mgd.py:108,130 — the TF1-era layout) but create_input_feed produces
    # [batch, list] (base_algorithm.py:182-183), so its NDCG call crashes
    # on any batch_size != list_size. Give train() the layout it was
    # written for; validation keeps the normal one.
    if algo == "MGD":
        _orig_train = model.train
        _orig_cif = model.create_input_feed

        def _untransposed_cif(input_feed, list_size):
            _orig_cif(input_feed, list_size)
            model.labels = model.labels.T.contiguous()

        def _train_shim(input_feed):
            model.create_input_feed = _untransposed_cif
            try:
                return _orig_train(input_feed)
            finally:
                model.create_input_feed = _orig_cif

        model.train = _train_shim
    # ULTRA_CONV_FEED=stochastic selects the reference's ONLINE protocol
    # (example/online_setting/*_exp_settings.json). Needed for PDGD at
    # scale: the reference's OFFLINE pdgd_exp_settings.json pairs PDGD
    # (which gathers max_candidate_num positions, ref pdgd.py:107) with
    # ClickSimulationFeed (which only builds rank_list_size positions) —
    # KeyError 'docid_input10' out of the box on any dataset whose lists
    # exceed the cutoff; yet another never-run reference config.
    # The feed MUST receive train_input_hparams: an empty hparam string
    # silently falls back to the feed's default PBM json, turning every
    # ULTRA_CONV_CLICK_JSON=ubm/cascade run into a PBM run (this exact bug
    # invalidated the first r5 reference-side non-PBM measurements —
    # verified by probing feed.click_model.model_name under "").
    feed_hparams = exp_settings["train_input_hparams"]
    if os.environ.get("ULTRA_CONV_FEED", "click") == "stochastic":
        from ultra.input_layer.stochastic_online_simulation_feed import (
            StochasticOnlineSimulationFeed)
        if not hasattr(model.hparams, "need_interleave"):
            model.hparams.add_hparam("need_interleave", False)
        feed = StochasticOnlineSimulationFeed(model, 256, feed_hparams)
    else:
        feed = ClickSimulationFeed(model, 256, feed_hparams)
    # Surface the ACTIVE model in every log so a wiring regression is
    # visible in the provenance trail.
    print(f"[ref] click model: {feed.click_model.model_name}", flush=True)
    vfeed = DirectLabelFeed(model, 256, "")

    def validate():
        summaries, counts = [], []
        idx = 0
        while idx < len(valid.initial_list):
            input_feed, _ = vfeed.get_next_batch(idx, valid,
                                                 check_validation=False)
            count = len(input_feed[model.labels_name[0]])
            model.validation(input_feed)
            summaries.append(dict(model.eval_summary))
            counts.append(count)
            idx += count
        return data_utils.merge_Summary(summaries, counts)

    t0 = time.time()
    sink = io.StringIO()
    n_evals = int(os.environ.get("ULTRA_CONV_EVALS", "5"))
    eval_every = max(steps // n_evals, 1)
    best = {}
    for step in range(steps):
        input_feed, _ = feed.get_batch(train, check_validation=True)
        # Some algorithms (e.g. pairwise_debias.py:127) torch.as_tensor the
        # float32 docid arrays with dtype=int64 themselves, which current
        # torch rejects; pre-cast (values are integral doc indices).
        for k in list(input_feed):
            if k.startswith("docid_input"):
                input_feed[k] = np.asarray(input_feed[k], dtype=np.int64)
        # MGD/NSGD read input_feed["winners"] unconditionally (mgd.py:104,
        # nsgd.py:115) though only the online interleave feeds provide it;
        # both branches overwrite self.winners before use, so None is safe.
        input_feed.setdefault("winners", None)
        with contextlib.redirect_stdout(sink):
            model.train(input_feed)
        if (step + 1) % eval_every == 0 or step + 1 == steps:
            with contextlib.redirect_stdout(sink):
                summary = validate()
            vals = {k: float(v) for k, v in summary.items()}
            for k, v in vals.items():
                if v > best.get(k, (-1.0, 0))[0]:
                    best[k] = (v, step + 1)
            print(f"[ref] step {step + 1} "
                  + " ".join(f"{k}={v:.4f}" for k, v in sorted(vals.items())),
                  flush=True)
    print("[ref] best " + " ".join(
        f"{k}={v:.4f}@{s}" for k, (v, s) in sorted(best.items())), flush=True)
    print(f"[ref] total {time.time() - t0:.1f}s")


def run_ours(data_dir, steps, algo="DLA"):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from ultra_pytorch_tpu.run.experiment import Experiment

    # The reference's defaults use ./example/... relative paths; pin them
    # to this repo's bundled copies so cwd doesn't matter.
    est = (f"propensity_estimator_json={repo}/example/"
           "PropensityEstimator/randomized_pbm_0.1_1.0_4_1.0.json")
    cmj = (f"click_model_json={repo}/example/ClickModel/"
           "pbm_0.1_1.0_4_1.0.json")
    algo_hparams = {
        "IPWrank": est,
        "PRSrank": est,
        "DBGD": cmj,
        "MGD": cmj,
        "NSGD": cmj,
    }.get(algo, "")
    extra = os.environ.get("ULTRA_CONV_ALGO_EXTRA", "")
    if extra:
        algo_hparams = (algo_hparams + "," if algo_hparams else "") + extra
    feed_name = {"click": "ClickSimulationFeed",
                 "stochastic": "StochasticOnlineSimulationFeed"}[
        os.environ.get("ULTRA_CONV_FEED", "click")]
    click_json = os.environ.get(
        "ULTRA_CONV_CLICK_JSON",
        f"{repo}/example/ClickModel/pbm_0.1_1.0_4_1.0.json")
    settings = {
        "train_input_feed": feed_name,
        "train_input_hparams": f"click_model_json={click_json}",
        "valid_input_feed": "DirectLabelFeed",
        "valid_input_hparams": "",
        "ranking_model": os.environ.get("ULTRA_CONV_RANKER", "DNN"),
        # ULTRA_CONV_RANKER_EXTRA=",compute_dtype=bfloat16" measures the
        # bf16 convergence delta on the same protocol (BASELINE.md).
        "ranking_model_hparams": (
            ("hidden_layer_sizes=[512, 256, 128]"
             if os.environ.get("ULTRA_CONV_RANKER", "DNN") == "DNN" else "")
            + os.environ.get("ULTRA_CONV_RANKER_EXTRA", "")),
        "learning_algorithm": algo,
        "learning_algorithm_hparams": algo_hparams,
        "metrics": ["ndcg", "mrr"],
        "metrics_topn": [3, 5, 10],
        "objective_metric": "ndcg_10",
        "selection_bias_cutoff": 10,
    }
    exp = Experiment(settings, data_dir, "/tmp/conv_ours_model",
                     batch_size=256,
                     seed=int(os.environ.get("ULTRA_CONV_SEED", "0")))
    exp.setup()
    exp.init_state()
    t0 = time.time()
    n_evals = int(os.environ.get("ULTRA_CONV_EVALS", "5"))
    eval_every = max(steps // n_evals, 1)
    # Keep the compiled-program count low and scan windows modest: remote
    # TPU compilation is minutes per program, so reuse one window size.
    window = 25
    done = 0
    since_eval = 0
    best = {}
    while done < steps:
        w = min(window, steps - done)
        exp.train_steps(w)
        done += w
        since_eval += w
        if since_eval >= eval_every or done >= steps:
            since_eval = 0
            summary = exp.validate("valid")
            for k, v in summary.items():
                if v > best.get(k, (-1.0, 0))[0]:
                    best[k] = (float(v), done)
            print(f"[ours] step {done} "
                  + " ".join(f"{k}={v:.4f}"
                             for k, v in sorted(summary.items())),
                  flush=True)
    print("[ours] best " + " ".join(
        f"{k}={v:.4f}@{s}" for k, (v, s) in sorted(best.items())), flush=True)
    print(f"[ours] total {time.time() - t0:.1f}s")


if __name__ == "__main__":
    which, data_dir, steps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    algo = sys.argv[4] if len(sys.argv) > 4 else "DLA"
    if which == "ref":
        run_reference(os.path.abspath(data_dir), steps, algo)
    else:
        run_ours(os.path.abspath(data_dir), steps, algo)
