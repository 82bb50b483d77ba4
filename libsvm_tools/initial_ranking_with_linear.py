"""Produce initial rankings by training this framework's Linear ranker.

Drop-in replacement for the SVMrank dependency of the reference's offline
pipelines (ref ``libsvm_tools/initial_ranking_with_svm_rank.py``): trains a
pairwise linear ranker on the (sampled) training file and writes
train/valid/test ``.predict`` files in the same one-score-per-line format
that ``prepare_exp_data_with_rank.py`` consumes.

Usage: python initial_ranking_with_linear.py <train> <valid> <test> <out>/ [steps]
"""

from __future__ import annotations

import os
import sys

import numpy as np


def _read_libsvm(path):
    labels, qids, rows = [], [], []
    n_feat = 0
    with open(path) as fin:
        for line in fin:
            arr = line.split()
            if not arr:
                continue
            labels.append(float(arr[0]))
            qids.append(arr[1].split(":")[1])
            fv = {}
            for tok in arr[2:]:
                if ":" not in tok:
                    continue
                i_s, v_s = tok.split(":")
                fv[int(i_s) - 1] = float(v_s)
                n_feat = max(n_feat, int(i_s))
            rows.append(fv)
    return labels, qids, rows, n_feat


def _dense(rows, n_feat):
    x = np.zeros((len(rows), n_feat), dtype=np.float32)
    for i, fv in enumerate(rows):
        for k, v in fv.items():
            if k < n_feat:
                x[i, k] = v
    return x


def train_and_predict(train_file, valid_file, test_file, output_path,
                      steps=500, seed=0):
    import jax
    if os.environ.get("ULTRA_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ULTRA_PLATFORM"])
    import jax.numpy as jnp
    import optax

    labels, qids, rows, n_feat = _read_libsvm(train_file)
    for path in (valid_file, test_file):
        *_, nf = _read_libsvm(path)
        n_feat = max(n_feat, nf)

    x = _dense(rows, n_feat)
    y = np.asarray(labels, np.float32)
    # group rows by query for pairwise training
    qid_arr = np.asarray(qids)
    uniq = {q: i for i, q in enumerate(dict.fromkeys(qids))}
    gid = np.asarray([uniq[q] for q in qids], np.int32)

    rng = jax.random.PRNGKey(seed)
    w = jnp.zeros((n_feat,))
    b = jnp.zeros(())
    opt = optax.adagrad(0.5)
    opt_state = opt.init((w, b))

    xd = jnp.asarray(x)
    yd = jnp.asarray(y)
    gd = jnp.asarray(gid)
    n = x.shape[0]

    @jax.jit
    def step(params, opt_state, rng):
        w, b = params
        k1, k2 = jax.random.split(rng)
        ii = jax.random.randint(k1, (4096,), 0, n)
        jj = jax.random.randint(k2, (4096,), 0, n)

        def loss_fn(params):
            w, b = params
            si = xd[ii] @ w + b
            sj = xd[jj] @ w + b
            sign = jnp.sign(yd[ii] - yd[jj]) * (gd[ii] == gd[jj])
            margin = jnp.log1p(jnp.exp(-sign * (si - sj))) * jnp.abs(sign)
            return jnp.sum(margin) / jnp.maximum(jnp.sum(jnp.abs(sign)), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = (w, b)
    for _ in range(steps):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)

    os.makedirs(output_path, exist_ok=True)
    w_np = np.asarray(params[0])
    b_np = float(params[1])
    np.savez(os.path.join(output_path, "model.npz"), w=w_np, b=b_np)

    for split, path in (("train", train_file), ("valid", valid_file),
                        ("test", test_file)):
        _, _, rows, _ = _read_libsvm(path)
        scores = _dense(rows, n_feat) @ w_np + b_np
        with open(os.path.join(output_path, split + ".predict"), "w") as f:
            for s in scores:
                f.write(f"{float(s):.8f}\n")
    print(f"wrote predictions to {output_path}")


if __name__ == "__main__":
    train_and_predict(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4],
                      int(sys.argv[5]) if len(sys.argv) > 5 else 500)
