"""Same-clicks / same-init replay: reference DLA vs ours, step by step.

The VERDICT-r4 #4 divergence investigation. DLA is the one reference
algorithm whose optimizer is re-instantiated EVERY train step
(``self.optimizer_func`` holds the torch.optim.Adagrad CLASS and
``separate_gradient_update`` constructs fresh instances per call, ref
``dla.py:127,153-154``) — so its accumulator never persists and each update
is ``-lr * g / (|g| + eps) ~= -lr * sign(g)``. Our side replays that with
``grad_strategy=ada_reset`` (``algorithms/base.py:adagrad_reset``,
unit-tested bit-compatible against fresh-instance torch in
``tests/test_optimizer.py``).

Both implementations are fed IDENTICAL batches (query indices + UBM clicks
precomputed centrally in numpy with one seed, sequential last-click
dependence matching ref ``click_models.py:138-185``) from IDENTICAL initial
parameters for BOTH towers (torch's ranker + DenoisingNet init copied into
the jax pytrees), so every intermediate is directly diffable:

  * forward ranker scores and propensity logits on the same params;
  * each side's reported loss vs a float64 numpy oracle of the reference's
    ``exam_loss + ranker_loss_weight * rank_loss`` (propensity-weighted
    softmax both ways, ref ``dla.py:179-237`` + ``base_algorithm.py:
    309-330``) computed from that side's own scores;
  * parameter trajectories (max-abs divergence, both towers);
  * validation nDCG@10 on the same valid split every ``eval_every`` steps,
    each side using its own (parity-tested) metric stack.

Usage:
  python tools/make_toy_data.py /tmp/replay_data --queries 10000 \
      --valid_queries 1000 --features 136 --max_label 4 \
      --min_docs 40 --max_docs 200        # the r4/r5 MSLR-shaped protocol
  python tools/replay_dla.py /tmp/replay_data <steps> [eval_every]

Environment: ULTRA_REPLAY_SEED (default 0), ULTRA_REPLAY_STRATEGY
(default ada_reset — the reference-faithful setting; 'ada' shows the
true-Adagrad trajectory instead), ULTRA_REPLAY_CLICK_JSON (default the
reference's bundled UBM model), ULTRA_PLATFORM=cpu to force our side off
the TPU.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from replay_prs import (REF, REPO, build_ref, jax_params_to_flat,  # noqa: E402
                        ref_batch_feed, ref_validate, torch_flat,
                        torch_params_to_jax)
from replay_ipw import oracle_softmax_loss  # noqa: E402


def load_ubm(path):
    """(exam_table [10, 10] with eta applied, click_prob [grades+1]).

    ``exam_prob`` in a UBM JSON is triangular (row r has r+1 entries,
    indexed by distance-to-last-click - 1, ref ``click_models.py:121-132``);
    pad rows to 10 with their own last entry (never reached at cutoff 10:
    distance <= rank + 1 always, so index <= r)."""
    with open(path) as fin:
        d = json.load(fin)
    rows = [[float(x) ** d["eta"] for x in row] for row in d["exam_prob"]]
    table = np.zeros((len(rows), len(rows)), np.float64)
    for i, row in enumerate(rows):
        table[i, :len(row)] = row
        table[i, len(row):] = row[-1]
    return table, np.asarray(d["click_prob"], np.float64)


def make_ubm_stream(labels, lengths, cutoff, steps, batch, exam_table,
                    click, seed):
    """Precompute (query_idx [steps, batch], clicks [steps, batch, cutoff])
    with the reference feed's semantics (click_simulation_feed.py:100-131):
    draw a query uniformly, sample UBM clicks ONCE sequentially down the
    list (exam = table[rank, rank - last_click_rank - 1], last_click_rank
    init -1, ref ``click_models.py:138-185``), REJECT the query if no
    click."""
    rng = np.random.default_rng(seed)
    n = labels.shape[0]
    qs = np.zeros((steps, batch), np.int64)
    cs = np.zeros((steps, batch, cutoff), np.float32)
    for t in range(steps):
        b = 0
        while b < batch:
            i = int(rng.random() * n)
            lab = np.clip(labels[i, :cutoff].astype(np.int64), 0,
                          len(click) - 1)
            valid = np.arange(cutoff) < lengths[i]
            c = np.zeros(cutoff, np.float32)
            last = -1
            for r in range(cutoff):
                if not valid[r]:
                    continue
                p = exam_table[r, r - last - 1] * click[lab[r]]
                if rng.random() < p:
                    c[r] = 1.0
                    last = r
            if not c.any():
                continue
            qs[t, b] = i
            cs[t, b] = c
            b += 1
    return qs, cs


def normalized_weights(prob):
    """ref dla.py:287-306 (no clip at default max_propensity_weight=-1)."""
    return prob[:, 0:1] / prob


def softmax64(x):
    x = x.astype(np.float64)
    e = np.exp(x - x.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def oracle_dla_loss(scores, prop_logits, clicks, ranker_loss_weight=1.0):
    """exam_loss + w * rank_loss in float64 (ref dla.py:197-237)."""
    pw = normalized_weights(softmax64(prop_logits))
    rank_loss = oracle_softmax_loss(scores, clicks, pw)
    rw = normalized_weights(softmax64(scores))
    exam_loss = oracle_softmax_loss(prop_logits, clicks, rw)
    return exam_loss + ranker_loss_weight * rank_loss


def torch_prop_to_jax(model):
    """DenoisingNet Linear(L,1) -> our {'w': [L], 'b': scalar} tower."""
    w = model.propensity_model.linear_layer.weight.detach().cpu().numpy()
    b = model.propensity_model.linear_layer.bias.detach().cpu().numpy()
    return {"w": w[0].copy(), "b": b[0].copy()}


def main():
    data_dir = os.path.abspath(sys.argv[1])
    steps = int(sys.argv[2])
    eval_every = int(sys.argv[3]) if len(sys.argv) > 3 else max(steps // 10, 1)
    seed = int(os.environ.get("ULTRA_REPLAY_SEED", "0"))
    strategy = os.environ.get("ULTRA_REPLAY_STRATEGY", "ada_reset")
    click_json = os.environ.get(
        "ULTRA_REPLAY_CLICK_JSON",
        os.path.join(REF, "example/ClickModel/ubm_0.1_1_4_1.0.json"))
    cutoff, batch = 10, 256

    # ---- reference side up first (torch init is the shared init).
    # build_ref parses grad_strategy from ULTRA_REPLAY_STRATEGY; the
    # reference only distinguishes 'sgd' vs everything-else==Adagrad
    # (dla.py:127-129), so 'ada_reset' lands on its (per-step-fresh)
    # Adagrad — exactly the behavior under test.
    model, ref_train, ref_valid = build_ref(
        data_dir, cutoff, algo="DLA",
        algo_hparams=f"grad_strategy={strategy}")
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
    settings = {
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[512, 256, 128]",
        "learning_algorithm": "DLA",
        "learning_algorithm_hparams": f"grad_strategy={strategy}",
        "metrics": ["ndcg", "mrr"],
        "metrics_topn": [10],
        "max_candidate_num": max_candidate,
        "selection_bias_cutoff": cutoff,
    }
    alg = create_algorithm(settings, ours_train.feature_size,
                           ours_train.max_label)
    state = alg.init_state(jax.random.PRNGKey(0), ours_train.feature_size)
    state = state.replace(
        params=jax.tree_util.tree_map(
            lambda a, b: np.asarray(b, np.float32), state.params,
            torch_params_to_jax(model)),
        aux={**state.aux,
             "propensity": jax.tree_util.tree_map(
                 lambda a, b: np.asarray(b, np.float32),
                 state.aux["propensity"], torch_prop_to_jax(model))})
    dev = ours_train.to_device()
    dev_valid = ours_valid.to_device()

    # consistency: both loaders must agree on the raw arrays
    assert np.allclose(np.asarray(ref_train.features)[:100],
                       ours_train.features[:100], atol=1e-6)
    ref_il = np.asarray([row[:cutoff] for row in ref_train.initial_list])
    np.testing.assert_array_equal(ref_il,
                                  ours_train.initial_list[:, :cutoff])

    # ---- central UBM click stream
    exam_table, click = load_ubm(click_json)
    lengths = (ours_train.initial_list >= 0).sum(axis=1)
    qs, cs = make_ubm_stream(ours_train.labels, lengths, cutoff, steps,
                             batch, exam_table, click, seed)

    train_step = jax.jit(alg.train_step)
    w = float(model.hparams.ranker_loss_weight)

    print(f"# replay DLA: {steps} steps x {batch}, cutoff {cutoff}, "
          f"seed {seed}, strategy {strategy}, clicks "
          f"{os.path.basename(click_json)}", flush=True)
    for t in range(steps):
        qidx, clicks = qs[t], cs[t]
        batch_ours = {k: v for k, v in dev.gather(
            qidx, list_size=cutoff).items()}
        batch_ours["labels"] = clicks

        if t % eval_every == 0 or t < 3:
            with torch.no_grad():
                feed = ref_batch_feed(model, ref_train, qidx, clicks,
                                      cutoff)
                model.create_input_feed(feed, cutoff)
                tscores = model.ranking_model(
                    model.model, cutoff).detach().cpu().numpy()
                tprop = model.propensity_model(
                    torch.transpose(model.labels, 0, 1)
                ).detach().cpu().numpy()
            jscores = np.asarray(alg.score_with_params(
                state.params, batch_ours, is_training=False))
            jprop = np.broadcast_to(np.asarray(jax.nn.elu(
                state.aux["propensity"]["w"]
                + state.aux["propensity"]["b"]))[None, :], tprop.shape)
            print(f"[t={t}] score_maxdiff="
                  f"{np.abs(tscores - jscores).max():.3e} "
                  f"prop_maxdiff={np.abs(tprop - jprop).max():.3e} "
                  f"oracle(ref)="
                  f"{oracle_dla_loss(tscores, tprop, clicks, w):.6f} "
                  f"oracle(ours)="
                  f"{oracle_dla_loss(jscores, jprop, clicks, w):.6f}",
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
            tw = model.propensity_model.linear_layer
            propdiff = max(
                np.abs(tw.weight.detach().cpu().numpy()[0]
                       - np.asarray(state.aux["propensity"]["w"])).max(),
                np.abs(tw.bias.detach().cpu().numpy()[0]
                       - np.asarray(state.aux["propensity"]["b"])).max())
            print(f"[t={t}] ref_loss={ref_loss:.6f} our_loss={our_loss:.6f} "
                  f"ranker_param_maxdiff={pdiff:.3e} "
                  f"prop_param_maxdiff={propdiff:.3e}", flush=True)
        if (t + 1) % eval_every == 0 or t + 1 == steps:
            rv = ref_validate(model, ref_valid)
            from ultra_pytorch_tpu.metrics import ranking as metrics_lib
            vb = dev_valid.gather(np.arange(ours_valid.num_queries))
            out = np.asarray(alg.score(state, vb))
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
