"""Generate golden metric/loss values from the reference implementation.

Runs the reference's torch metrics and losses (imported from the read-only
checkout) on fixed random inputs and stores the results as JSON under
``tests/golden/``. The committed artifact is DATA used for behavioral
parity tests; no reference code is copied. Run offline:

    python tools/gen_reference_goldens.py /root/reference tests/golden
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main(ref_path="/root/reference", out_dir="tests/golden"):
    sys.path.insert(0, ref_path)
    import torch
    from ultra.utils import metrics as ref_metrics

    torch.manual_seed(0)
    rng = np.random.default_rng(42)

    B, L = 6, 8
    max_label = 2.0
    labels = rng.integers(0, 3, size=(B, L)).astype(np.float64)
    # make one row contain an invalid (-1) label to exercise the
    # invalid-label path, and one row all-zero
    labels[2, 5] = -1.0
    labels[4, :] = 0.0
    labels[4, 1] = 1.0
    preds = rng.normal(size=(B, L)).round(4)

    t_labels = torch.tensor(labels, dtype=torch.float32)
    t_preds = torch.tensor(preds, dtype=torch.float32)

    ref_metrics.RankingMetricKey.MAX_LABEL = max_label
    topns = [1, 3, 5, 8]

    golden = {
        "inputs": {
            "labels": labels.tolist(),
            "predictions": preds.tolist(),
            "max_label": max_label,
            "topns": topns,
        },
        "metrics": {},
        "losses": {},
    }

    for key in ["mrr", "err", "ndcg", "arp", "map",
                "ordered_pair_accuracy"]:
        fn = ref_metrics.make_ranking_metric_fn(key, topns)
        vals = fn(t_labels, t_preds, None)
        vals = vals.reshape(-1).detach().numpy()
        golden["metrics"][key] = [float(v) for v in vals]

    # losses via a minimal concrete reference algorithm instance is heavy;
    # call the standalone softmax CE + replicate the loss formulas through
    # the BaseAlgorithm methods using a tiny shim object.
    from ultra.learning_algorithm import base_algorithm as ref_base

    class Shim(ref_base.BaseAlgorithm):
        def __init__(self):
            pass

        def train(self, input_feed):
            pass

        def validation(self, input_feed):
            pass

    shim = Shim()
    clicks = (rng.random((B, L)) < 0.3).astype(np.float64)
    pw = rng.random((B, L)).round(4) + 0.5
    t_clicks = torch.tensor(clicks, dtype=torch.float32)
    t_pw = torch.tensor(pw, dtype=torch.float32)

    golden["inputs"]["clicks"] = clicks.tolist()
    golden["inputs"]["propensity_weights"] = pw.tolist()

    golden["losses"]["softmax_loss"] = float(
        shim.softmax_loss(t_preds, t_clicks, t_pw))
    golden["losses"]["softmax_loss_unweighted"] = float(
        shim.softmax_loss(t_preds, t_clicks))
    try:
        golden["losses"]["sigmoid_loss"] = float(
            shim.sigmoid_loss_on_list(t_preds, t_clicks, t_pw))
    except TypeError:
        # The reference's sigmoid_loss_on_list crashes on modern torch
        # (`torch.minimum(labels, 1)` with an int). Compute the formula it
        # intends (BCEWithLogits * pw, sum over list, mean over batch).
        crit = __import__("torch").nn.BCEWithLogitsLoss(reduction="none")
        loss = crit(t_preds, t_clicks) * t_pw
        golden["losses"]["sigmoid_loss"] = float(
            loss.sum(dim=1).mean())
        golden["losses"]["sigmoid_loss_note"] = (
            "reference impl crashes on torch>=1.5; value computed from its "
            "intended formula")
    golden["losses"]["softmax_cross_entropy"] = [
        float(v) for v in ref_base.softmax_cross_entropy_with_logits(
            t_preds, t_clicks)]

    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "reference_values.json")
    with open(out, "w") as fout:
        json.dump(golden, fout, indent=2)
    print(out)


if __name__ == "__main__":
    main(*sys.argv[1:])
