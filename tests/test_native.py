"""Native C++ host-kernel tests (vs NumPy oracles)."""

import numpy as np
import pytest

from lkpy_tpu import _native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not _native.available():
        pytest.skip("native library unavailable")


def test_coo_to_csr_matches_numpy():
    rng = np.random.default_rng(42)
    rows = rng.integers(0, 100, 5000)
    cols = rng.integers(0, 80, 5000)
    rowptr, colind, perm = _native.coo_to_csr(rows, cols, 100, 80)
    order = np.lexsort((cols, rows))
    np.testing.assert_array_equal(rows[perm], rows[order])
    np.testing.assert_array_equal(colind, cols[order])
    counts = np.bincount(rows, minlength=100)
    np.testing.assert_array_equal(np.diff(rowptr), counts)


def test_transpose_matches_scipy():
    import scipy.sparse as sps

    mat = sps.random(60, 40, density=0.2, random_state=7, format="csr")
    rowptr, colind, perm = _native.transpose_csr(
        mat.indptr.astype(np.int64), mat.indices.astype(np.int32), 60, 40
    )
    t = mat.T.tocsr()
    t.sort_indices()
    np.testing.assert_array_equal(rowptr, t.indptr)
    np.testing.assert_array_equal(colind, t.indices)
    np.testing.assert_allclose(mat.data[perm], t.data)


def test_id_index():
    ids = np.array([100, 5, 42, 7], dtype=np.int64)
    idx = _native.IdIndex(ids)
    out = idx.lookup(np.array([42, 100, 999], dtype=np.int64))
    np.testing.assert_array_equal(out, [2, 0, -1])


def test_sample_negatives_verified():
    import scipy.sparse as sps

    mat = sps.random(30, 50, density=0.3, random_state=1, format="csr")
    mat.sort_indices()
    rows = np.arange(30, dtype=np.int64)
    out = _native.sample_negatives(
        mat.indptr.astype(np.int64), mat.indices.astype(np.int32), rows, 5, 50, seed=42
    )
    assert out.shape == (30, 5)
    dense = mat.toarray()
    for r in range(30):
        assert (dense[r, out[r]] == 0).all()


def test_argtopn():
    vals = np.array([0.5, np.nan, 2.0, -1.0, 2.0], dtype=np.float32)
    out = _native.argtopn(vals, 3)
    np.testing.assert_array_equal(out, [2, 4, 0])


def test_vocab_uses_native():
    from lkpy_tpu.data import Vocabulary

    ids = np.arange(10000) * 3
    v = Vocabulary(ids)
    nums = v.numbers(np.array([0, 3, 29997, 1]), missing="negative")
    np.testing.assert_array_equal(nums, [0, 1, 9999, -1])
    assert v._native_index() is not None
