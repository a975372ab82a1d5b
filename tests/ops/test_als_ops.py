"""Kernel tests with NumPy oracles (SURVEY.md §7.3: each kernel gets an oracle test)."""

import numpy as np
import pytest
import scipy.sparse as sps

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops import als as als_ops
from lkpy_tpu.ops.sparse import bucket_rows, pad_rows


@pytest.fixture
def rand_csr():
    rng = np.random.default_rng(42)
    mat = sps.random(50, 30, density=0.2, random_state=42, format="csr")
    mat.data = rng.normal(size=mat.nnz).astype(np.float32)
    return CSR.from_scipy(mat)


def oracle_explicit(csr, right, reg):
    """Reference row-by-row explicit solve (matching accel/als/explicit.rs:81)."""
    k = right.shape[1]
    out = np.zeros((csr.nrows, k), dtype=np.float64)
    for r in range(csr.nrows):
        cols = csr.row_cols(r)
        if len(cols) == 0:
            continue
        vals = csr.row_values(r)
        M = right[cols].astype(np.float64)
        A = M.T @ M + reg * len(cols) * np.eye(k)
        y = M.T @ vals
        out[r] = np.linalg.solve(A, y)
    return out


def oracle_implicit(csr, right, reg):
    k = right.shape[1]
    OtOr = right.T.astype(np.float64) @ right + reg * np.eye(k)
    out = np.zeros((csr.nrows, k), dtype=np.float64)
    for r in range(csr.nrows):
        cols = csr.row_cols(r)
        if len(cols) == 0:
            continue
        conf = csr.row_values(r).astype(np.float64)
        M = right[cols].astype(np.float64)
        A = OtOr + (M.T * conf) @ M
        y = M.T @ (conf + 1.0)
        out[r] = np.linalg.solve(A, y)
    return out


def test_pad_rows(rand_csr):
    p = pad_rows(rand_csr)
    assert p.cols.shape[0] == rand_csr.nrows
    lens = rand_csr.row_lengths()
    assert np.asarray(p.mask).sum() == rand_csr.nnz
    # row 0 contents
    np.testing.assert_array_equal(np.asarray(p.cols)[0, : lens[0]], rand_csr.row_cols(0))


def test_bucket_rows_cover(rand_csr):
    buckets = bucket_rows(rand_csr)
    rows = np.concatenate([np.asarray(b.rows) for b in buckets])
    nonempty = np.nonzero(rand_csr.row_lengths() > 0)[0]
    assert sorted(rows.tolist()) == sorted(nonempty.tolist())
    total_mask = sum(int(np.asarray(b.mask).sum()) for b in buckets)
    assert total_mask == rand_csr.nnz


def test_explicit_half_epoch_matches_oracle(rand_csr):
    rng = np.random.default_rng(1)
    k = 8
    right = rng.normal(size=(30, k)).astype(np.float32)
    left0 = np.zeros((50, k), dtype=np.float32)
    import jax.numpy as jnp

    buckets = bucket_rows(rand_csr)
    left, delta = als_ops.als_half_epoch(buckets, jnp.asarray(left0), jnp.asarray(right), 0.1, mode="explicit")
    expected = oracle_explicit(rand_csr, right, 0.1)
    np.testing.assert_allclose(np.asarray(left), expected, rtol=2e-4, atol=2e-5)
    assert delta == pytest.approx(np.sqrt(np.sum(expected**2)), rel=1e-3)


def test_implicit_half_epoch_matches_oracle():
    rng = np.random.default_rng(2)
    mat = sps.random(40, 25, density=0.25, random_state=7, format="csr")
    mat.data = (rng.uniform(1, 5, size=mat.nnz) * 40).astype(np.float32)
    csr = CSR.from_scipy(mat)
    k = 8
    right = np.abs(rng.normal(size=(25, k))).astype(np.float32) * 0.01
    left0 = np.zeros((40, k), dtype=np.float32)
    import jax.numpy as jnp

    buckets = bucket_rows(csr)
    left, _ = als_ops.als_half_epoch(buckets, jnp.asarray(left0), jnp.asarray(right), 0.1, mode="implicit")
    expected = oracle_implicit(csr, right, 0.1)
    np.testing.assert_allclose(np.asarray(left), expected, rtol=2e-4, atol=2e-5)


def test_solve_row_matches_bucket(rand_csr):
    rng = np.random.default_rng(3)
    right = rng.normal(size=(30, 8)).astype(np.float32)
    r = 5
    cols = rand_csr.row_cols(r)
    vals = rand_csr.row_values(r)
    x = als_ops.solve_row_explicit(cols, vals, right, 0.1)
    expected = oracle_explicit(rand_csr, right, 0.1)[r]
    np.testing.assert_allclose(x, expected, rtol=1e-4, atol=1e-5)


def test_large_bucket_solve_matches_fused(monkeypatch, rand_csr):
    """The shared blocked-Cholesky path (_gram_scan + _solve_large_bucket)
    produces the same solutions as the fused per-bucket solve."""
    import jax.numpy as jnp

    import lkpy_tpu.ops.als as als_ops
    from lkpy_tpu.ops.sparse import bucket_rows

    rng = np.random.default_rng(9)
    right = jnp.asarray(rng.standard_normal((rand_csr.ncols, 8)).astype(np.float32))
    otor = als_ops.implicit_otor(right, jnp.float32(0.1))
    buckets = als_ops.chunk_buckets(bucket_rows(rand_csr, field="rating"), entries=512)
    monkeypatch.setattr(als_ops, "_SOLVE_BATCH", 16)
    checked = 0
    for ch in buckets:
        C, B, _P = ch.cols.shape
        if C * B < 32:
            continue
        fused = als_ops._solve_scan_implicit(ch.cols, ch.values, ch.mask, right, otor)
        A, y = als_ops._gram_scan_implicit(ch.cols, ch.values, ch.mask, right, otor)
        xs = als_ops._solve_large_bucket(A, y)
        np.testing.assert_allclose(np.asarray(xs), np.asarray(fused), rtol=2e-4, atol=2e-4)
        checked += 1
    assert checked > 0
