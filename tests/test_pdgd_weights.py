"""Brute-force verification of PDGD's flipped-denominator pair weights
against a direct transcription of the reference's per-pair computation
(ref pdgd.py:138-183)."""

import jax
import jax.numpy as jnp
import numpy as np

from ultra_pytorch_tpu.algorithms.pdgd import pdgd_pair_weights


def brute_force_weights(scores, clicks, mask, L, tau):
    """Numpy mirror of the reference's loop (ref pdgd.py:116-183)."""
    B, Lc = scores.shape
    scores = scores - scores.max(axis=1, keepdims=True)
    e = np.exp(tau * scores) * mask
    out = np.zeros((B, L, L))
    for b in range(B):
        denominators = np.cumsum(e[b, ::-1])[::-1]
        sum_log_d = np.sum(np.log(denominators, where=denominators > 0,
                                  out=np.zeros_like(denominators)))
        for l in range(L):
            if mask[b, l] == 0 or clicks[b, l] <= 0:
                continue
            for k in range(min(l + 2, L)):
                if mask[b, k] == 0 or clicks[b, k] >= clicks[b, l]:
                    continue
                flipped = e[b].copy()
                flipped[k], flipped[l] = e[b, l], e[b, k]
                fd = np.cumsum(flipped[::-1])[::-1]
                sum_log_f = np.sum(np.log(fd, where=fd > 0,
                                          out=np.zeros_like(fd)))
                w = 1.0 / (1.0 + np.exp(min(sum_log_f - sum_log_d, 20)))
                out[b, l, k] = w
    return out


def test_pair_weights_match_bruteforce():
    rng = np.random.default_rng(0)
    B, Lc, L = 5, 12, 6
    scores = rng.normal(size=(B, Lc)).astype(np.float32)
    mask = np.ones((B, Lc), np.float32)
    mask[1, 9:] = 0.0
    mask[3, 4:] = 0.0
    clicks = (rng.random((B, Lc)) < 0.4).astype(np.float32) * mask
    clicks[:, L:] = 0.0

    got = np.asarray(pdgd_pair_weights(
        jnp.asarray(scores), jnp.asarray(clicks), jnp.asarray(mask),
        L, tau=1.0))
    want = brute_force_weights(scores, clicks, mask, L, 1.0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_pair_weights_tau():
    rng = np.random.default_rng(1)
    B, Lc, L = 3, 8, 5
    scores = rng.normal(size=(B, Lc)).astype(np.float32)
    mask = np.ones((B, Lc), np.float32)
    clicks = np.zeros((B, Lc), np.float32)
    clicks[:, 2] = 1.0
    got = np.asarray(pdgd_pair_weights(
        jnp.asarray(scores), jnp.asarray(clicks), jnp.asarray(mask),
        L, tau=2.5))
    want = brute_force_weights(scores, clicks, mask, L, 2.5)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
