"""Same-clicks / same-init replay: reference IPWrank vs ours, step by step.

The VERDICT-r4 #1 harness — the IPW counterpart of tools/replay_prs.py
(which it imports for all the shared machinery). Both implementations are
fed IDENTICAL batches (query indices + PBM clicks precomputed centrally in
numpy with one seed) from IDENTICAL initial ranker parameters (torch's
init copied into the jax pytree), so every intermediate is directly
diffable:

  * forward scores on the same batch (same params -> must match to f32);
  * the per-list PROPENSITY WEIGHTS each side computes from the click
    pattern (ref ipw_rank.py:116-128: host loop over
    getPropensityForOneList; ours: sim/propensity.py table lookup) —
    these must be IDENTICAL, they come from the same IPW_list JSON;
  * the reported loss of each side vs a NUMPY float64 oracle of the
    reference's propensity-weighted softmax loss (ref
    base_algorithm.py:309-330, incl. the +1e-7 label offset) computed
    from that side's own scores — catches formula drift independently of
    score drift;
  * parameter trajectories (max-abs divergence per step);
  * validation nDCG@10 on the same valid split every `eval_every` steps,
    each side using its own (parity-tested) metric stack.

Usage:
  python tools/make_toy_data.py /tmp/replay_data --queries 10000 \
      --valid_queries 1000 --features 136 --max_label 4 \
      --min_docs 40 --max_docs 200        # the r4/r5 MSLR-shaped protocol
  python tools/replay_ipw.py /tmp/replay_data <steps> [eval_every]

Environment: ULTRA_REPLAY_SEED (default 0), ULTRA_REPLAY_STRATEGY
(default ada), ULTRA_PLATFORM=cpu to force our side off the TPU.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from replay_prs import (REF, REPO, build_ref, jax_params_to_flat,  # noqa: E402
                        load_click_model, make_stream, ref_batch_feed,
                        ref_validate, torch_flat, torch_params_to_jax)


def oracle_softmax_loss(scores, clicks, pw):
    """ref base_algorithm.py:309-330 in float64 numpy: propensity-weighted
    listwise softmax with the +1e-7 label offset and the weighted-label
    total normalization."""
    s = scores.astype(np.float64)
    weighted = (clicks.astype(np.float64) + 1e-7) * pw.astype(np.float64)
    denom = weighted.sum(axis=1, keepdims=True)
    label_dis = np.where(denom > 0, weighted / np.where(denom > 0, denom, 1),
                         0.0)
    logsm = s - s.max(axis=1, keepdims=True)
    logsm = logsm - np.log(np.exp(logsm).sum(axis=1, keepdims=True))
    per_list = np.sum(-label_dis * logsm, axis=1) * denom[:, 0]
    return float(per_list.sum() / weighted.sum())


def ref_propensity_weights(model, clicks):
    """The reference's per-list host loop (ipw_rank.py:116-128)."""
    return np.asarray([
        model.propensity_estimator.getPropensityForOneList(list(c))
        for c in clicks], np.float64)


def main():
    data_dir = os.path.abspath(sys.argv[1])
    steps = int(sys.argv[2])
    eval_every = int(sys.argv[3]) if len(sys.argv) > 3 else max(steps // 10, 1)
    seed = int(os.environ.get("ULTRA_REPLAY_SEED", "0"))
    cutoff, batch = 10, 256

    # ---- reference side up first (torch init is the shared init)
    model, ref_train, ref_valid = build_ref(data_dir, cutoff, algo="IPWrank")
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
    # BOTH sides use the REFERENCE's estimator JSON so the IPW tables are
    # bit-identical (the two repos' bundled tables differ by ~0.3%
    # sampling noise, enough to flip first-step Adagrad signs).
    est = os.path.join(REF, "example/PropensityEstimator/"
                            "randomized_pbm_0.1_1.0_4_1.0.json")
    settings = {
        "ranking_model": "DNN",
        "ranking_model_hparams": "hidden_layer_sizes=[512, 256, 128]",
        "learning_algorithm": "IPWrank",
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
    shared = torch_params_to_jax(model)
    state = state.replace(
        params=jax.tree_util.tree_map(
            lambda a, b: np.asarray(b, np.float32), state.params, shared))
    dev = ours_train.to_device()
    dev_valid = ours_valid.to_device()

    # consistency: both loaders must agree on the raw arrays
    assert np.allclose(np.asarray(ref_train.features)[:100],
                       ours_train.features[:100], atol=1e-6)
    ref_il = np.asarray([row[:cutoff] for row in ref_train.initial_list])
    np.testing.assert_array_equal(ref_il,
                                  ours_train.initial_list[:, :cutoff])
    # and both estimators must hold the SAME table
    np.testing.assert_allclose(
        np.asarray(model.propensity_estimator.IPW_list),
        np.asarray(alg.propensity_estimator.IPW_list), rtol=0)

    # ---- click stream
    exam, click = load_click_model(
        os.path.join(REPO, "example/ClickModel/pbm_0.1_1.0_4_1.0.json"))
    lengths = (ours_train.initial_list >= 0).sum(axis=1)
    qs, cs = make_stream(ours_train.labels, lengths, cutoff, steps, batch,
                         exam, click, seed)

    train_step = jax.jit(alg.train_step)

    print(f"# replay IPW: {steps} steps x {batch}, cutoff {cutoff}, "
          f"seed {seed}", flush=True)
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
            jscores = np.asarray(alg.score_with_params(
                state.params, batch_ours, is_training=False))
            # per-list propensity weights, both sides
            ref_pw = ref_propensity_weights(model, clicks)
            our_pw = np.asarray(alg.propensity_estimator.weights(clicks))
            print(f"[t={t}] score_maxdiff="
                  f"{np.abs(tscores - jscores).max():.3e} "
                  f"pw_maxdiff={np.abs(ref_pw - our_pw).max():.3e} "
                  f"oracle(ref_scores)="
                  f"{oracle_softmax_loss(tscores, clicks, ref_pw):.6f} "
                  f"oracle(our_scores)="
                  f"{oracle_softmax_loss(jscores, clicks, our_pw):.6f}",
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
            print(f"[t={t}] ref_loss={ref_loss:.6f} our_loss={our_loss:.6f} "
                  f"param_maxdiff={pdiff:.3e}", flush=True)
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
