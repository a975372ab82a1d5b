"""Retrieval top-k property tests against numpy oracles
(`ops/topk.py::retrieval_topk`, the serving/retrieval primitive)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import jax.numpy as jnp

from lkpy_tpu.ops.topk import retrieval_topk

FAST = settings(max_examples=25, deadline=None)


@st.composite
def retrieval_problems(draw):
    seed = draw(st.integers(0, 2**31 - 1))
    b = draw(st.integers(1, 8))
    n = draw(st.integers(2, 60))
    k = draw(st.integers(1, 8))
    d = draw(st.sampled_from([3, 8, 16]))
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, d)).astype(np.float32)
    t = rng.standard_normal((n, d)).astype(np.float32)
    return q, t, min(k, n)


@FAST
@given(retrieval_problems())
def test_exact_topk_matches_numpy(prob):
    q, t, k = prob
    scores, idx = retrieval_topk(jnp.asarray(q), jnp.asarray(t), k, exact=True)
    scores, idx = np.asarray(scores), np.asarray(idx)
    want = q @ t.T
    for b in range(q.shape[0]):
        order = np.argsort(-want[b], kind="stable")[:k]
        np.testing.assert_allclose(scores[b], want[b][order], rtol=1e-5, atol=1e-5)
        # returned scores descending & consistent with indices
        np.testing.assert_allclose(scores[b], want[b][idx[b]], rtol=1e-5, atol=1e-5)
        assert np.all(np.diff(scores[b]) <= 1e-6)


@FAST
@given(retrieval_problems())
def test_topk_with_item_bias(prob):
    q, t, k = prob
    rng = np.random.default_rng(1)
    bias = rng.standard_normal(t.shape[0]).astype(np.float32)
    scores, idx = retrieval_topk(jnp.asarray(q), jnp.asarray(t), k, i_bias=jnp.asarray(bias), exact=True)
    scores, idx = np.asarray(scores), np.asarray(idx)
    want = q @ t.T + bias[None, :]
    for b in range(q.shape[0]):
        top = np.sort(want[b])[::-1][:k]
        np.testing.assert_allclose(np.sort(scores[b])[::-1], top, rtol=1e-5, atol=1e-5)


@FAST
@given(retrieval_problems())
def test_approx_topk_subset_of_catalog(prob):
    """The approximate path returns valid indices and descending scores;
    recall is validated statistically elsewhere (bench + recall tests)."""
    q, t, k = prob
    scores, idx = retrieval_topk(jnp.asarray(q), jnp.asarray(t), k, exact=False)
    idx = np.asarray(idx)
    assert idx.shape == (q.shape[0], k)
    assert (idx >= 0).all() and (idx < t.shape[0]).all()
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=1) <= 1e-5)
