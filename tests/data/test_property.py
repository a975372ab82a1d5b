"""Property-based tests with hypothesis (reference pattern: tests/data, tests/eval)."""

import numpy as np
from hypothesis import given, settings

from lkpy_tpu.testing.arrays import scored_lists, sparse_csr


@given(sparse_csr())
@settings(max_examples=30, deadline=None)
def test_csr_transpose_involution(csr):
    t2 = csr.transpose().transpose()
    assert t2.shape == csr.shape
    np.testing.assert_array_equal(t2.rowptr, csr.rowptr)
    np.testing.assert_array_equal(t2.colind, csr.colind)
    if csr.values is not None:
        np.testing.assert_allclose(t2.values, csr.values)


@given(sparse_csr())
@settings(max_examples=30, deadline=None)
def test_csr_scipy_roundtrip(csr):
    sp = csr.to_scipy()
    from lkpy_tpu.data.matrix import CSR

    back = CSR.from_scipy(sp)
    np.testing.assert_array_equal(back.colind, csr.colind)


@given(scored_lists())
@settings(max_examples=30, deadline=None)
def test_topn_sorted(il):
    if il.scores() is None:
        return
    top = il.top_n(10)
    s = top.scores()
    assert len(top) <= 10
    if len(s) > 1:
        assert (np.diff(s) <= 1e-6).all()
    assert not np.isnan(s).any()


@given(scored_lists(scores="yes"))
@settings(max_examples=30, deadline=None)
def test_isin_self(il):
    assert il.isin(il).all()
