"""Property tests for host->device sparse layouts: every layout must
reconstruct the source matrix exactly (`ops/sparse.py`)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.sparse import DeviceCOO, bucket_rows, pad_rows, round_up
from lkpy_tpu.testing.arrays import coo_arrays, sparse_csr

FAST = settings(max_examples=40, deadline=None)


def dense_of(csr: CSR) -> np.ndarray:
    return csr.to_scipy().toarray()


@FAST
@given(sparse_csr())
def test_pad_rows_reconstructs(csr):
    p = pad_rows(csr)
    dense = np.zeros(csr.shape, np.float32)
    cols = np.asarray(p.cols)
    mask = np.asarray(p.mask)
    vals = np.asarray(p.values) if p.values is not None else np.ones_like(cols, np.float32)
    for r in range(csr.nrows):
        dense[r, cols[r][mask[r]]] = vals[r][mask[r]]
    np.testing.assert_allclose(dense, dense_of(csr))


@FAST
@given(sparse_csr(), st.integers(1, 16))
def test_pad_rows_subset_any_width(csr, align):
    rows = np.arange(0, csr.nrows, 2, dtype=np.int32)
    p = pad_rows(csr, rows=rows, align=align)
    assert np.asarray(p.cols).shape[0] == len(rows)
    lens = np.asarray(p.mask).sum(axis=1)
    want = (csr.rowptr[rows + 1] - csr.rowptr[rows]).astype(np.int64)
    np.testing.assert_array_equal(lens, want)


@FAST
@given(sparse_csr(), st.floats(1.2, 4.0))
def test_bucket_rows_partition_and_reconstruct(csr, ratio):
    buckets = bucket_rows(csr, ratio=ratio)
    seen_rows: list[int] = []
    dense = np.zeros(csr.shape, np.float32)
    for b in buckets:
        rows = np.asarray(b.rows)
        cols = np.asarray(b.cols)
        mask = np.asarray(b.mask)
        vals = np.asarray(b.values) if b.values is not None else np.ones_like(cols, np.float32)
        seen_rows.extend(rows.tolist())
        for i, r in enumerate(rows):
            dense[r, cols[i][mask[i]]] = vals[i][mask[i]]
        # bucket width covers the longest member row
        lens = mask.sum(axis=1)
        assert cols.shape[1] >= (lens.max() if len(lens) else 0)
    # non-empty rows are covered exactly once
    row_lens = np.diff(csr.rowptr)
    nonempty = np.flatnonzero(row_lens > 0)
    assert sorted(seen_rows) == sorted(nonempty.tolist())
    np.testing.assert_allclose(dense, dense_of(csr))


@FAST
@given(sparse_csr())
def test_device_coo_round_trip(csr):
    d = DeviceCOO.from_csr(csr)
    dense = np.zeros(csr.shape, np.float32)
    rows = np.asarray(d.row)
    cols = np.asarray(d.col)
    vals = np.asarray(d.values) if d.values is not None else np.ones(len(rows), np.float32)
    dense[rows, cols] = vals
    np.testing.assert_allclose(dense, dense_of(csr))


@FAST
@given(coo_arrays())
def test_csr_from_coo_round_trip(data):
    rows, cols, vals, shape = data
    csr = CSR.from_coo(rows, cols, vals, shape)
    assert csr.nnz == len(rows)
    want = np.zeros(shape, np.float32)
    want[rows, cols] = vals
    np.testing.assert_allclose(dense_of(csr), want)
    # columns sorted within rows
    for r in range(shape[0]):
        rc = csr.row_cols(r)
        assert np.all(np.diff(rc) > 0)


@FAST
@given(coo_arrays())
def test_csr_transpose_involution(data):
    rows, cols, vals, shape = data
    csr = CSR.from_coo(rows, cols, vals, shape)
    t = csr.transpose()
    assert t.shape == (shape[1], shape[0])
    np.testing.assert_allclose(dense_of(t), dense_of(csr).T)
    np.testing.assert_allclose(dense_of(t.transpose()), dense_of(csr))


@given(st.integers(0, 10_000), st.integers(1, 512))
@settings(max_examples=60, deadline=None)
def test_round_up(x, m):
    r = round_up(x, m)
    assert r >= x and r % m == 0 and r - x < m
