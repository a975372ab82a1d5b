"""Item-kNN scoring property tests against a per-pair numpy oracle in the
REFERENCE accumulation direction (reference: src/accel/knn/item_score.rs:23
score_explicit / :72 score_implicit)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lkpy_tpu.ops.knn import NeighborTable, score_items_explicit, score_items_implicit

FAST = settings(max_examples=20, deadline=None)


@st.composite
def scoring_problems(draw):
    seed = draw(st.integers(0, 2**31 - 1))
    n_items = draw(st.integers(4, 25))
    K = draw(st.integers(1, 6))
    rng = np.random.default_rng(seed)
    # random top-K neighbor table: descending positive sims, 0 = padding
    sims = np.sort(rng.uniform(0, 1, (n_items, K)).astype(np.float32), axis=1)[:, ::-1]
    n_nbrs = rng.integers(0, min(K, n_items - 1) + 1, n_items)
    idx = np.zeros((n_items, K), np.int32)
    for i in range(n_items):
        sims[i, n_nbrs[i] :] = 0.0
        others = np.delete(np.arange(n_items), i)
        idx[i, : n_nbrs[i]] = rng.choice(others, size=n_nbrs[i], replace=False)
    table = NeighborTable(idx, np.ascontiguousarray(sims))
    R = draw(st.integers(1, min(n_items, 6)))
    rated = rng.choice(n_items, size=R, replace=False).astype(np.int64)
    ratings = rng.uniform(1, 5, R).astype(np.float32)
    means = rng.uniform(1, 4, n_items).astype(np.float32)
    max_nbrs = draw(st.integers(1, K + 2))
    min_nbrs = draw(st.integers(1, 2))
    return table, rated, ratings, means, max_nbrs, min_nbrs


def oracle_contributions(table, rated):
    """contrib[target] = [(sim, rated_pos)] in reference direction: each
    rated item pushes (sim to target) for targets in ITS neighbor row."""
    contrib = {}
    for p, ri in enumerate(rated):
        for j in range(table.k):
            s = table.sims[ri, j]
            if s > 0:
                contrib.setdefault(int(table.indices[ri, j]), []).append((float(s), p))
    return contrib


@FAST
@given(scoring_problems())
def test_implicit_scoring_oracle(prob):
    table, rated, ratings, means, max_nbrs, min_nbrs = prob
    targets = np.arange(table.n_items, dtype=np.int64)
    scores, counts = score_items_implicit(table, targets, rated, max_nbrs, min_nbrs)
    contrib = oracle_contributions(table, rated)
    for t in targets:
        entries = sorted(contrib.get(int(t), []), reverse=True)[: min(max_nbrs, len(rated))]
        if len(entries) < min_nbrs:
            assert np.isnan(scores[t])
        else:
            want = sum(s for s, _ in entries)
            np.testing.assert_allclose(scores[t], want, rtol=1e-5, atol=1e-6)
            assert counts[t] == len(entries)


@FAST
@given(scoring_problems())
def test_explicit_scoring_oracle(prob):
    table, rated, ratings, means, max_nbrs, min_nbrs = prob
    targets = np.arange(table.n_items, dtype=np.int64)
    scores, counts = score_items_explicit(
        table, targets, rated, ratings, means, max_nbrs, min_nbrs
    )
    contrib = oracle_contributions(table, rated)
    centered = ratings - means[rated]
    for t in targets:
        entries = sorted(contrib.get(int(t), []), reverse=True)[: min(max_nbrs, len(rated))]
        if len(entries) < min_nbrs:
            assert np.isnan(scores[t])
        else:
            num = sum(s * centered[p] for s, p in entries)
            den = sum(abs(s) for s, _ in entries)
            want = num / den + means[t]
            np.testing.assert_allclose(scores[t], want, rtol=1e-4, atol=1e-4)


@FAST
@given(scoring_problems())
def test_scoring_subset_consistency(prob):
    """Scoring a target subset equals slicing the full-scoring result."""
    table, rated, ratings, means, max_nbrs, min_nbrs = prob
    full, fc = score_items_implicit(
        table, np.arange(table.n_items, dtype=np.int64), rated, max_nbrs, min_nbrs
    )
    sub_t = np.arange(0, table.n_items, 2, dtype=np.int64)
    sub, sc = score_items_implicit(table, sub_t, rated, max_nbrs, min_nbrs)
    np.testing.assert_array_equal(sub, full[sub_t])
    np.testing.assert_array_equal(sc, fc[sub_t])
