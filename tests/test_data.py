import numpy as np

from ultra_pytorch_tpu.data import dataset as data_lib


def test_load_ultra_format(toy_data_dir):
    ds = data_lib.read_data(toy_data_dir, "train")
    assert ds.feature_size == 64
    assert ds.num_queries > 0
    assert ds.initial_list.shape == ds.labels.shape
    assert ds.max_label == 2.0
    # every kept query has >= 2 docs and a positive label
    lengths = (ds.initial_list >= 0).sum(axis=1)
    assert (lengths >= 2).all()
    assert (ds.labels.max(axis=1) > 0).all()


def test_load_libsvm_format(toy_data_dir):
    import os
    import shutil
    import tempfile

    # libsvm autodetect path: only <prefix>.txt present
    tmp = tempfile.mkdtemp()
    os.makedirs(os.path.join(tmp, "train"))
    shutil.copy(os.path.join(toy_data_dir, "train", "train.txt"),
                os.path.join(tmp, "train", "train.txt"))
    ds = data_lib.read_data(tmp, "train")
    assert ds.feature_size > 0
    assert ds.num_queries > 0
    ultra = data_lib.read_data(toy_data_dir, "train")
    assert ds.num_queries == ultra.num_queries


def test_pad_and_to_device(toy_data_dir):
    ds = data_lib.read_data(toy_data_dir, "valid")
    orig = ds.rank_list_size
    ds.pad(orig + 5)
    assert ds.initial_list.shape[1] == orig + 5
    dev = ds.to_device()
    assert dev.doc_idx.shape == (ds.num_queries, orig + 5)
    assert dev.features.shape[0] == ds.features.shape[0] + 1  # PAD row
    # PAD row is zeros and padded positions point at it
    assert float(np.abs(np.asarray(dev.features[-1])).sum()) == 0.0
    batch = dev.gather(np.arange(4))
    assert batch["features"].shape == (4, orig + 5, ds.feature_size)
    assert batch["mask"].shape == (4, orig + 5)
    # masked positions have zero features
    m = np.asarray(batch["mask"])[..., None]
    f = np.asarray(batch["features"])
    assert np.abs(f * (1 - m)).sum() == 0.0


def test_pad_heads(toy_data_dir):
    """pad(pad_tails=False) prepends the -1 sentinels (ref
    data_utils.py:476-498 head-padding mode)."""
    ds = data_lib.read_data(toy_data_dir, "valid")
    orig = ds.rank_list_size
    lists_before = ds.initial_list.copy()
    labels_before = ds.labels.copy()
    ds.pad(orig + 3, pad_tails=False)
    assert ds.initial_list.shape[1] == orig + 3
    assert (ds.initial_list[:, :3] == -1).all()
    np.testing.assert_array_equal(ds.initial_list[:, 3:], lists_before)
    assert (ds.labels[:, :3] == 0).all()
    np.testing.assert_array_equal(ds.labels[:, 3:], labels_before)
    # device export keeps head pads masked out
    dev = ds.to_device()
    batch = dev.gather(np.arange(2))
    m = np.asarray(batch["mask"])
    assert m[:, :3].sum() == 0


def test_gather_topk(toy_data_dir):
    ds = data_lib.read_data(toy_data_dir, "train")
    dev = ds.to_device()
    batch = dev.gather(np.arange(3), list_size=2)
    assert batch["features"].shape[1] == 2


def test_merge_summary():
    merged = data_lib.merge_summary(
        [{"ndcg_10": 1.0}, {"ndcg_10": 0.0}], [1, 3])
    assert abs(merged["ndcg_10"] - 0.25) < 1e-9


def test_device_dataset_is_pytree(toy_data_dir):
    """DeviceDataset must round-trip through tree_map/jit as an argument —
    the guard against re-introducing closure-captured (HLO-embedded)
    feature tables."""
    import jax
    import jax.numpy as jnp

    from ultra_pytorch_tpu.data import dataset as data_lib

    ds = data_lib.read_data(toy_data_dir, "train")
    dev = ds.to_device()
    dev2 = jax.tree_util.tree_map(lambda x: x, dev)
    assert type(dev2) is type(dev)
    assert dev2.max_label == dev.max_label
    assert dev2.features.shape == dev.features.shape

    @jax.jit
    def first_labels(d):
        return d.labels[0]

    out = first_labels(dev)
    assert out.shape == (dev.list_size,)

    # the jitted program must not embed the arrays as constants
    txt = jax.jit(first_labels).lower(dev).as_text()
    assert len(txt) < 200_000, f"HLO unexpectedly large: {len(txt)} bytes"
