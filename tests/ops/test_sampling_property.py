"""Negative-sampling property tests: verified negatives must never be
observed interactions, on both membership paths (Bloom + exact binary
search), over random matrices (reference semantics:
src/accel/data/sampling.rs rejection sampling)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import jax
import jax.numpy as jnp

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.sampling import DeviceCSRIndex, sample_negatives
from lkpy_tpu.testing.arrays import coo_arrays

FAST = settings(max_examples=20, deadline=None)


@st.composite
def sparse_with_rows(draw):
    rows, cols, vals, shape = draw(coo_arrays(max_rows=20, max_cols=30, max_nnz=120))
    # rows must have at least one free column for negatives to exist
    nrows, ncols = shape
    if ncols < 3:
        ncols = 3
        shape = (nrows, ncols)
    csr = CSR.from_coo(rows, cols, vals, shape)
    lens = np.diff(csr.rowptr)
    # attempt-capped rejection (the reference's semantics, sampling.rs:50)
    # may keep an observed draw when a row is nearly full — the guarantee
    # only holds w.h.p., so test rows with >= 3/4 of their columns free
    # (16 attempts -> failure odds ~1e-9 per slot)
    candidates = np.flatnonzero(lens <= ncols // 4)
    seed = draw(st.integers(0, 2**31 - 1))
    return csr, candidates, seed


@FAST
@given(sparse_with_rows(), st.booleans(), st.integers(1, 4))
def test_negatives_are_unobserved(data, use_bloom, n):
    csr, candidates, seed = data
    if len(candidates) == 0:
        return
    idx = DeviceCSRIndex.from_csr(csr, bloom=use_bloom)
    rows = jnp.asarray(np.resize(candidates, 8).astype(np.int32))
    negs = np.asarray(sample_negatives(jax.random.key(seed), idx, rows, n=n))
    assert negs.shape == (8, n)
    dense = csr.to_scipy().toarray() != 0
    observed = np.zeros(csr.shape, bool)
    observed[dense] = True
    for r, row in zip(np.asarray(rows), negs):
        for c in row:
            assert 0 <= c < csr.ncols
            assert not observed[r, c], f"sampled observed pair ({r}, {c})"


@FAST
@given(sparse_with_rows())
def test_bloom_and_exact_paths_agree_on_membership(data):
    """Both index forms accept only true negatives — build both and check
    the same draws verify identically (the Bloom may only *waste* attempts,
    never accept an observed pair)."""
    csr, candidates, seed = data
    if len(candidates) == 0:
        return
    rows = jnp.asarray(np.resize(candidates, 4).astype(np.int32))
    for bloom in (True, False):
        idx = DeviceCSRIndex.from_csr(csr, bloom=bloom)
        negs = np.asarray(sample_negatives(jax.random.key(seed), idx, rows, n=2))
        dense = csr.to_scipy().toarray() != 0
        for r, row in zip(np.asarray(rows), negs):
            for c in row:
                assert not dense[r, c]


@FAST
@given(sparse_with_rows())
def test_sampling_is_deterministic_per_key(data):
    csr, candidates, seed = data
    if len(candidates) == 0:
        return
    idx = DeviceCSRIndex.from_csr(csr)
    rows = jnp.asarray(np.resize(candidates, 4).astype(np.int32))
    a = np.asarray(sample_negatives(jax.random.key(seed), idx, rows, n=2))
    b = np.asarray(sample_negatives(jax.random.key(seed), idx, rows, n=2))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(sample_negatives(jax.random.key(seed + 1), idx, rows, n=2))
    # different keys *may* collide on tiny catalogs; just require validity
    assert c.shape == a.shape
