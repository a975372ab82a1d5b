"""
Host→device sparse layout semantics: pad_rows, bucket_rows, DeviceCOO.

These layouts are the static-shape replacement for the reference's ragged
CSR streaming (reference: src/accel/sparse/csr.rs:36,
src/accel/als/explicit.rs:54) and feed every batched per-row solve and the
serving history path, so their correctness is oracle-tested directly here.
"""

import numpy as np
import pytest
import scipy.sparse as sps

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.sparse import DeviceCOO, bucket_rows, pad_rows, round_up


def make_csr(rng, nrows=40, ncols=25, density=0.2):
    mat = sps.random(nrows, ncols, density=density, random_state=np.random.RandomState(42))
    mat.data = rng.integers(1, 6, len(mat.data)).astype(np.float64)
    return CSR.from_scipy(mat.tocsr())


@pytest.fixture()
def csr():
    return make_csr(np.random.default_rng(3))


def test_round_up():
    assert round_up(0, 8) == 0
    assert round_up(1, 8) == 8
    assert round_up(8, 8) == 8
    assert round_up(9, 8) == 16
    assert round_up(17, 4) == 20


def test_pad_rows_reconstructs_rows(csr):
    p = pad_rows(csr)
    assert p.n == csr.nrows
    assert p.width >= int(csr.row_lengths().max())
    assert p.width % 8 == 0
    cols = np.asarray(p.cols)
    mask = np.asarray(p.mask)
    vals = np.asarray(p.values)
    for r in range(csr.nrows):
        want_cols = csr.row_cols(r)
        got = cols[r][mask[r]]
        np.testing.assert_array_equal(got, want_cols)
        np.testing.assert_allclose(vals[r][mask[r]], csr.row_values(r))
        # padding slots are zeroed so masked gathers stay in-bounds
        assert np.all(cols[r][~mask[r]] == 0)
        assert np.all(vals[r][~mask[r]] == 0.0)


def test_pad_rows_row_subset_order(csr):
    rows = np.array([7, 2, 2, 11], dtype=np.int32)
    p = pad_rows(csr, rows=rows)
    np.testing.assert_array_equal(np.asarray(p.rows), rows)
    mask = np.asarray(p.mask)
    lens = csr.row_lengths()
    np.testing.assert_array_equal(mask.sum(axis=1), lens[rows])


def test_pad_rows_structural_only(csr):
    p = pad_rows(csr, field=None)
    assert p.values is None


def test_pad_rows_width_too_small_raises(csr):
    maxlen = int(csr.row_lengths().max())
    with pytest.raises(ValueError, match="exceeds pad width"):
        pad_rows(csr, width=maxlen - 1)


def test_pad_rows_empty_matrix():
    empty = CSR.from_scipy(sps.csr_array((4, 5)))
    p = pad_rows(empty)
    assert p.n == 4
    assert not np.asarray(p.mask).any()


def test_bucket_rows_partition(csr):
    buckets = bucket_rows(csr)
    lens = csr.row_lengths()
    seen = np.concatenate([np.asarray(b.rows) for b in buckets]) if buckets else np.array([])
    # every nonempty row appears in exactly one bucket; empty rows in none
    np.testing.assert_array_equal(np.sort(seen), np.nonzero(lens > 0)[0])
    for b in buckets:
        bl = lens[np.asarray(b.rows)]
        assert int(bl.max()) <= b.width
        # row content survives bucketing
        mask = np.asarray(b.mask)
        np.testing.assert_array_equal(mask.sum(axis=1), bl)


def test_bucket_rows_widths_increase(csr):
    buckets = bucket_rows(csr, ratio=2.0)
    widths = [b.width for b in buckets]
    assert widths == sorted(widths)
    assert len(set(widths)) == len(widths)


def test_bucket_rows_ratio_ladder_denser():
    # a finer ladder can only produce narrower-or-equal buckets per row
    rng = np.random.default_rng(9)
    csr = make_csr(rng, nrows=200, ncols=400, density=0.08)
    lens = csr.row_lengths()
    for ratio in (1.35, 1.5, 2.0):
        waste = 0.0
        total = 0.0
        for b in bucket_rows(csr, ratio=ratio):
            bl = lens[np.asarray(b.rows)]
            waste += float((b.width - bl).sum())
            total += float(b.width * b.n)
        occ = 1 - waste / total
        # measured occupancy stays above the ladder's worst case 1/ratio
        assert occ >= 1 / ratio - 1e-6


def test_bucket_rows_max_width_truncates():
    rng = np.random.default_rng(11)
    csr = make_csr(rng, nrows=30, ncols=60, density=0.4)
    cap = 8
    buckets = bucket_rows(csr, max_width=cap)
    lens = csr.row_lengths()
    assert all(b.width <= cap for b in buckets)
    for b in buckets:
        mask = np.asarray(b.mask)
        cols = np.asarray(b.cols)
        for i, r in enumerate(np.asarray(b.rows)):
            want = csr.row_cols(int(r))[: min(lens[r], cap)]
            np.testing.assert_array_equal(cols[i][mask[i]], want)


def test_bucket_rows_empty():
    empty = CSR.from_scipy(sps.csr_array((4, 5)))
    assert bucket_rows(empty) == []


def test_device_coo_round_trip(csr):
    coo = DeviceCOO.from_csr(csr)
    assert coo.nnz == csr.nnz
    assert coo.shape == csr.shape
    sp = sps.coo_array(
        (np.asarray(coo.values), (np.asarray(coo.row), np.asarray(coo.col))), shape=coo.shape
    )
    np.testing.assert_allclose(sp.toarray(), csr.to_scipy().toarray())


def test_device_coo_structural(csr):
    coo = DeviceCOO.from_csr(csr, field=None)
    assert coo.values is None
    assert coo.nnz == csr.nnz
