"""Native C++ parser parity vs the pure-Python loaders."""

import numpy as np
import pytest

from ultra_pytorch_tpu.data import dataset as data_lib
from ultra_pytorch_tpu.data import native


@pytest.fixture(scope="module")
def built():
    if not native.native_available():
        pytest.skip("native parser not built (g++ unavailable)")
    return True


def test_ultra_parse_matches_python(built, toy_data_dir, monkeypatch):
    ds_native = data_lib.read_data(toy_data_dir, "train")

    monkeypatch.setattr(native, "native_available", lambda: False)
    ds_py = data_lib.read_data(toy_data_dir, "train")

    assert ds_native.qids == ds_py.qids
    assert ds_native.dids == ds_py.dids
    np.testing.assert_allclose(ds_native.features, ds_py.features,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(ds_native.initial_list, ds_py.initial_list)
    np.testing.assert_allclose(ds_native.labels, ds_py.labels)


def test_libsvm_parse_matches_python(built, toy_data_dir, monkeypatch):
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    os.makedirs(os.path.join(tmp, "train"))
    shutil.copy(os.path.join(toy_data_dir, "train", "train.txt"),
                os.path.join(tmp, "train", "train.txt"))

    ds_native = data_lib.read_data(tmp, "train")
    monkeypatch.setattr(native, "native_available", lambda: False)
    ds_py = data_lib.read_data(tmp, "train")

    assert ds_native.qids == ds_py.qids
    np.testing.assert_array_equal(ds_native.initial_list, ds_py.initial_list)
    np.testing.assert_allclose(ds_native.labels, ds_py.labels)
    np.testing.assert_allclose(ds_native.features, ds_py.features,
                               rtol=1e-6, atol=1e-7)
    assert ds_native.max_label == ds_py.max_label


def test_native_rank_cut(built, toy_data_dir):
    ds = data_lib.read_data(toy_data_dir, "train", rank_cut=3)
    assert ds.rank_list_size <= 3


def test_native_speed_smoke(built, tmp_path):
    """Native parse of a mid-sized synthetic libsvm file must beat Python."""
    import time

    rng = np.random.default_rng(0)
    path = tmp_path / "big"
    path.mkdir()
    fn = path / "big.txt"
    with open(fn, "w") as f:
        for q in range(200):
            for d in range(40):
                toks = " ".join(
                    f"{i + 1}:{rng.uniform(-1, 1):.6f}" for i in range(136))
                f.write(f"{int(rng.integers(0, 3))} qid:{q} {toks}\n")

    t_native = float("inf")
    for _ in range(3):  # min-of-3: robust to CPU contention from other tests
        t0 = time.perf_counter()
        out = native.parse_letor_file(str(fn), native.FORMAT_LIBSVM, None)
        t_native = min(t_native, time.perf_counter() - t0)
    assert out is not None
    feats, labels, qids = out
    assert feats.shape == (8000, 136)

    # Python text-parse timing for the same work
    t0 = time.perf_counter()
    rows = 0
    with open(fn) as f:
        for line in f:
            arr = line.split()
            for tok in arr[2:]:
                i, v = tok.split(":")
                float(v)
            rows += 1
    t_python = time.perf_counter() - t0
    assert rows == 8000
    assert t_native < t_python, (t_native, t_python)
