"""Same-clicks / same-init replay: reference PRSrank vs ours, step by step.

The VERDICT-r3 #1 harness. Both implementations are fed IDENTICAL batches
(query indices + simulated PBM clicks precomputed centrally in numpy with
one seed) from IDENTICAL initial ranker parameters (torch's init copied
into the jax pytree), so every intermediate is directly diffable:

  * forward scores on the same batch (same params -> must match to f32);
  * the reported loss of each side vs a NUMPY oracle of the reference's
    loss formula (ref prs_rank.py:126-151) computed from that side's own
    scores — catches formula drift independently of score drift;
  * parameter trajectories (max-abs divergence per step);
  * validation nDCG@10 on the same valid split every `eval_every` steps,
    each side using its own (parity-tested) metric stack.

Usage:
  python tools/make_toy_data.py /tmp/replay_data --queries 10000 \
      --valid_queries 1000 --features 136 --max_label 4 \
      --min_docs 40 --max_docs 200        # the r4/r5 MSLR-shaped protocol
  python tools/replay_prs.py /tmp/replay_data <steps> [eval_every]

Environment: ULTRA_REPLAY_SEED (default 0), ULTRA_PLATFORM=cpu to force
our side off the TPU.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/ultra_tpu_jax"))

if os.environ.get("ULTRA_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["ULTRA_PLATFORM"])

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


# -- central click stream ---------------------------------------------------

def load_click_model(path):
    with open(path) as fin:
        d = json.load(fin)
    # {model_name, eta, click_prob[grade], exam_prob[rank]}; PBM applies
    # exam_prob ** eta (ref click_models.py:74-78).
    exam = np.asarray(d["exam_prob"], np.float64) ** d["eta"]
    click = np.asarray(d["click_prob"], np.float64)
    return exam, click


def make_stream(labels, lengths, cutoff, steps, batch, exam, click, seed):
    """Precompute (query_idx [steps, batch], clicks [steps, batch, cutoff])
    with the reference feed's EXACT semantics (click_simulation_feed.py:
    100-131): draw a query uniformly via int(random()*N), sample PBM
    clicks ONCE on the top-`cutoff` labels, REJECT the query if no click
    (the resample-same-list loop is commented out in the reference)."""
    rng = np.random.default_rng(seed)
    n = labels.shape[0]
    qs = np.zeros((steps, batch), np.int64)
    cs = np.zeros((steps, batch, cutoff), np.float32)
    for t in range(steps):
        b = 0
        while b < batch:
            i = int(rng.random() * n)
            lab = labels[i, :cutoff].astype(np.int64)
            valid = np.arange(cutoff) < lengths[i]
            p = exam[np.arange(cutoff)] * click[np.clip(lab, 0, len(click) - 1)]
            c = (rng.random(cutoff) < p) & valid
            if not c.any():
                continue
            qs[t, b] = i
            cs[t, b] = c.astype(np.float32)
            b += 1
    return qs, cs


# -- numpy oracle of the reference loss formula -----------------------------

def oracle_loss(scores, clicks, ipw, sigma=1.0):
    """ref prs_rank.py:126-151 in float64 numpy (stable argsort on -scores;
    torch.sort is stable on CPU)."""
    order = np.argsort(-scores, axis=1, kind="stable")
    s = np.take_along_axis(scores, order, 1).astype(np.float64)
    lab = np.take_along_axis(clicks, order, 1).astype(np.float64)
    ipw_s = np.take_along_axis(ipw, order, 1).astype(np.float64)
    pw_s = np.where(ipw_s == 0, 0.0, 1.0 / np.where(ipw_s == 0, 1, ipw_s))
    L = scores.shape[1]
    triu = np.triu(np.ones((L, L)), k=1)[None]
    prs = ipw_s[:, :, None] * pw_s[:, None, :] * triu
    std_p = 0.5 * (1.0 + np.clip(lab[:, :, None] - lab[:, None, :], -1, 1))
    p = 1.0 / (np.exp(-sigma * (s[:, :, None] - s[:, None, :])) + 1.0)
    # ideal-sorted IDCG, BATCH-summed scalar (ref dcg() :207-226 quirk)
    ideal = np.sort(clicks, axis=1)[:, ::-1].astype(np.float64)
    idcg = np.sum((2.0 ** ideal - 1.0) / np.log(np.arange(1, L + 1) + 1.0))
    gains = (2.0 ** lab - 1.0) / (idcg if idcg else 1.0)
    ng = gains[:, :, None] - gains[:, None, :]
    dist = 1.0 / np.log2(np.arange(L) + 2.0)
    dd = dist[:, None] - dist[None, :]
    delta = np.abs(ng) * np.abs(dd)[None]
    pt, zt = np.clip(p * triu, 0, 1), std_p * triu
    logp = np.maximum(np.log(np.maximum(pt, 1e-300)), -100.0)
    log1mp = np.maximum(np.log(np.maximum(1 - pt, 1e-300)), -100.0)
    bce = -(zt * logp + (1 - zt) * log1mp) * (delta * triu)
    return float(np.sum(bce * prs))


# -- the two sides ----------------------------------------------------------

def build_ref(data_dir, cutoff, algo="PRSrank", algo_hparams=None):
    sys.path.insert(0, REF)
    import torch

    import ultra.utils.data_utils as data_utils
    from ultra.utils.sys_tools import find_class

    torch.manual_seed(int(os.environ.get("ULTRA_REPLAY_SEED", "0")))
    train = data_utils.read_data(data_dir + "/", "train", None)
    valid = data_utils.read_data(data_dir + "/", "valid", None)
    max_candidate = max(train.rank_list_size, valid.rank_list_size)
    train.pad(max_candidate)
    valid.pad(max_candidate)
    est = os.path.join(REF, "example/PropensityEstimator/"
                             "randomized_pbm_0.1_1.0_4_1.0.json")
    strategy = os.environ.get("ULTRA_REPLAY_STRATEGY", "ada")
    if algo_hparams is None:
        # IPW/PRS default: a pretrained estimator + the optimizer select.
        # (Algorithms without the estimator hparam, e.g. DLA, must pass
        # their own string — the reference's HParams.parse rejects
        # undeclared keys.)
        algo_hparams = (f"propensity_estimator_json={est},"
                        f"grad_strategy={strategy}")
    exp = {
        "learning_algorithm_hparams": algo_hparams,
        "ranking_model": "ultra.ranking_model.DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[512, 256, 128]",
        "metrics": ["ndcg", "mrr"],
        "metrics_topn": [10],
        "max_candidate_num": max_candidate,
        "selection_bias_cutoff": cutoff,
    }
    import contextlib
    import io

    # Same current-torch shim as tools/compare_convergence.py: feed arrays
    # arrive float32; docids must be int64 before torch.as_tensor.
    from ultra.learning_algorithm.base_algorithm import BaseAlgorithm

    def _patched(self, input_feed, list_size):
        self.labels = []
        self.docid_inputs = []
        self.letor_features = input_feed["letor_features"]
        for i in range(list_size):
            self.docid_inputs.append(np.asarray(
                input_feed[self.docid_inputs_name[i]], dtype=np.int64))
            self.labels.append(input_feed[self.labels_name[i]])
        self.labels = torch.from_numpy(
            np.transpose(np.asarray(self.labels)))
        self.docid_inputs = torch.as_tensor(
            np.asarray(self.docid_inputs), dtype=torch.int64)

    BaseAlgorithm.create_input_feed = _patched

    # Same current-torch shim as tools/compare_convergence.py: the
    # reference calls nn.utils.clip_grad_value_ on LABEL tensors (which
    # never have grads — a semantic no-op, e.g. ipw_rank.py:164);
    # torch>=2 raises on the resulting empty grad list.
    _orig_clip_value = torch.nn.utils.clip_grad_value_

    def _safe_clip_value(parameters, clip_value, **kw):
        params = (list(parameters) if not torch.is_tensor(parameters)
                  else [parameters])
        if not any(p.grad is not None for p in params):
            return
        return _orig_clip_value(params, clip_value, **kw)

    torch.nn.utils.clip_grad_value_ = _safe_clip_value
    with contextlib.redirect_stdout(io.StringIO()):
        model = find_class(f"ultra.learning_algorithm.{algo}")(train, exp)
    return model, train, valid


def torch_params_to_jax(model):
    """torch DNN Sequential -> our DNN pytree (layer_norm{j}/linear{j})."""
    import torch

    layers = []
    sd = {k.replace("sequential.", ""): v.detach().cpu().numpy()
          for k, v in model.model.state_dict().items()}
    j = 0
    while f"linear{j}.weight" in sd:
        layers.append({
            "norm": {"scale": sd[f"layer_norm{j}.weight"].copy(),
                     "bias": sd[f"layer_norm{j}.bias"].copy()},
            "linear": {"w": sd[f"linear{j}.weight"].T.copy(),
                       "b": sd[f"linear{j}.bias"].copy()},
        })
        j += 1
    return {"layers": layers}


def jax_params_to_flat(params):
    import jax

    def part(p):
        if hasattr(p, "key"):
            return str(p.key)
        if hasattr(p, "idx"):
            return str(p.idx)
        return str(p)

    return {"/".join(part(p) for p in path): np.asarray(leaf)
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(params)[0]}


def torch_flat(model):
    out = {}
    sd = {k.replace("sequential.", ""): v.detach().cpu().numpy()
          for k, v in model.model.state_dict().items()}
    j = 0
    while f"linear{j}.weight" in sd:
        out[f"layers/{j}/norm/scale"] = sd[f"layer_norm{j}.weight"]
        out[f"layers/{j}/norm/bias"] = sd[f"layer_norm{j}.bias"]
        out[f"layers/{j}/linear/w"] = sd[f"linear{j}.weight"].T
        out[f"layers/{j}/linear/b"] = sd[f"linear{j}.bias"]
        j += 1
    return out


def ref_batch_feed(model, data_set, qidx, clicks, cutoff):
    """Build the exact input_feed ClickSimulationFeed would emit for these
    (query, clicks) pairs (ref click_simulation_feed.py:132-163)."""
    docid_inputs, letor_features, labels = [], [], []
    for i, c in zip(qidx, clicks):
        base = len(letor_features)
        for x in range(cutoff):
            if data_set.initial_list[i][x] >= 0:
                letor_features.append(
                    data_set.features[data_set.initial_list[i][x]])
        docid_inputs.append([
            -1 if data_set.initial_list[i][x] < 0 else base + x
            for x in range(cutoff)])
        labels.append(list(c))
    n = len(letor_features)
    for row in docid_inputs:
        for j, v in enumerate(row):
            if v < 0:
                row[j] = n
    feed = {"letor_features": np.asarray(letor_features, np.float32)}
    for l in range(cutoff):
        feed[f"docid_input{l}"] = np.asarray(
            [d[l] for d in docid_inputs], np.float32)
        feed[f"label{l}"] = np.asarray([lab[l] for lab in labels],
                                       np.float32)
    return feed


def ref_validate(model, valid):
    import contextlib
    import io

    sys.path.insert(0, REF)
    import ultra.utils.data_utils as data_utils
    from ultra.input_layer.direct_label_feed import DirectLabelFeed

    vfeed = DirectLabelFeed(model, 256, "")
    summaries, counts = [], []
    idx = 0
    with contextlib.redirect_stdout(io.StringIO()):
        while idx < len(valid.initial_list):
            input_feed, _ = vfeed.get_next_batch(idx, valid,
                                                 check_validation=False)
            count = len(input_feed[model.labels_name[0]])
            model.validation(input_feed)
            summaries.append(dict(model.eval_summary))
            counts.append(count)
            idx += count
    merged = data_utils.merge_Summary(summaries, counts)
    return {k: float(v) for k, v in merged.items()}


def main():
    data_dir = os.path.abspath(sys.argv[1])
    steps = int(sys.argv[2])
    eval_every = int(sys.argv[3]) if len(sys.argv) > 3 else max(steps // 10, 1)
    seed = int(os.environ.get("ULTRA_REPLAY_SEED", "0"))
    cutoff, batch = 10, 256

    # ---- reference side up first (torch init is the shared init)
    model, ref_train, ref_valid = build_ref(data_dir, cutoff)
    import torch

    # ---- our side
    sys.path.insert(0, REPO)
    import jax

    from ultra_pytorch_tpu.data import dataset as data_lib
    from ultra_pytorch_tpu.run.experiment import create_algorithm

    ours_train = data_lib.read_data(data_dir, "train", None)
    ours_valid = data_lib.read_data(data_dir, "valid", None)
    max_candidate = max(ours_train.rank_list_size,
                        ours_valid.rank_list_size)
    ours_train.pad(max_candidate)
    ours_valid.pad(max_candidate)
    # BOTH sides use the REFERENCE's estimator JSON so the prs weights are
    # bit-identical (the two repos' bundled tables differ by ~0.3%
    # sampling noise, enough to flip first-step Adagrad signs).
    est = os.path.join(REF, "example/PropensityEstimator/"
                            "randomized_pbm_0.1_1.0_4_1.0.json")
    settings = {
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[512, 256, 128]",
        "learning_algorithm": "PRSrank",
        "learning_algorithm_hparams":
            f"propensity_estimator_json={est},grad_strategy="
            + os.environ.get("ULTRA_REPLAY_STRATEGY", "ada"),
        "metrics": ["ndcg", "mrr"],
        "metrics_topn": [10],
        "max_candidate_num": max_candidate,
        "selection_bias_cutoff": cutoff,
    }
    alg = create_algorithm(settings, ours_train.feature_size,
                           ours_train.max_label)
    state = alg.init_state(jax.random.PRNGKey(0), ours_train.feature_size)
    # Shared init: copy torch's freshly initialized weights into the pytree.
    shared = torch_params_to_jax(model)
    state = state.replace(
        params=jax.tree_util.tree_map(
            lambda a, b: np.asarray(b, np.float32), state.params, shared))
    dev = ours_train.to_device()
    dev_valid = ours_valid.to_device()

    # consistency: both loaders must agree on the raw arrays
    assert np.allclose(np.asarray(ref_train.features)[:100],
                       ours_train.features[:100], atol=1e-6)
    ref_il = np.asarray([row[:cutoff]
                         for row in ref_train.initial_list])
    np.testing.assert_array_equal(ref_il,
                                  ours_train.initial_list[:, :cutoff])

    # ---- click stream
    exam, click = load_click_model(
        os.path.join(REPO, "example/ClickModel/pbm_0.1_1.0_4_1.0.json"))
    lengths = (ours_train.initial_list >= 0).sum(axis=1)
    qs, cs = make_stream(ours_train.labels, lengths, cutoff, steps, batch,
                         exam, click, seed)

    ipw_table = alg.propensity_estimator
    train_step = jax.jit(alg.train_step)

    print(f"# replay: {steps} steps x {batch}, cutoff {cutoff}, "
          f"seed {seed}", flush=True)
    for t in range(steps):
        qidx, clicks = qs[t], cs[t]
        batch_ours = {k: v for k, v in dev.gather(
            qidx, list_size=cutoff).items()}
        batch_ours["labels"] = clicks

        # forward-score diff on the same params (every eval window)
        if t % eval_every == 0 or t < 3:
            with torch.no_grad():
                feed = ref_batch_feed(model, ref_train, qidx, clicks,
                                      cutoff)
                model.create_input_feed(feed, cutoff)
                tscores = model.ranking_model(
                    model.model, cutoff).detach().cpu().numpy()
            jscores = np.asarray(alg.score_with_params(
                state.params, batch_ours, is_training=False))
            ipw_np = np.asarray(ipw_table.weights(
                clicks, use_non_clicked_data=True))
            print(f"[t={t}] score_maxdiff="
                  f"{np.abs(tscores - jscores).max():.3e} "
                  f"oracle(ref_scores)={oracle_loss(tscores, clicks, ipw_np):.4f} "
                  f"oracle(our_scores)={oracle_loss(jscores, clicks, ipw_np):.4f}",
                  flush=True)

        # reference step
        feed = ref_batch_feed(model, ref_train, qidx, clicks, cutoff)
        import contextlib
        import io
        with contextlib.redirect_stdout(io.StringIO()):
            ref_loss, _, _ = model.train(feed)
        # our step
        state, metrics = train_step(state, batch_ours,
                                    jax.random.PRNGKey(t))
        our_loss = float(metrics["loss"])

        if t % eval_every == 0 or t < 3:
            tf = torch_flat(model)
            jf = jax_params_to_flat(state.params)
            pdiff = max(np.abs(tf[k] - jf[k]).max() for k in tf)
            print(f"[t={t}] ref_loss={ref_loss:.4f} our_loss={our_loss:.4f} "
                  f"param_maxdiff={pdiff:.3e}", flush=True)
        if (t + 1) % eval_every == 0 or t + 1 == steps:
            rv = ref_validate(model, ref_valid)
            from ultra_pytorch_tpu.metrics import ranking as metrics_lib
            out = np.asarray(alg.score(state, dev_valid.gather(
                np.arange(ours_valid.num_queries))))
            vb = dev_valid.gather(np.arange(ours_valid.num_queries))
            summary = metrics_lib.evaluate(
                vb["labels"], out, ["ndcg", "mrr"], [10],
                max_label=ours_valid.max_label, mask=vb["mask"])
            ov = {k: float(v) for k, v in summary.items()}
            print(f"[t={t + 1}] VALID ref " +
                  " ".join(f"{k}={v:.4f}" for k, v in sorted(rv.items())) +
                  " | ours " +
                  " ".join(f"{k}={v:.4f}" for k, v in sorted(ov.items())),
                  flush=True)


if __name__ == "__main__":
    main()
