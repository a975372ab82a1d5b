"""Ranking-metric property tests: bounds, perfection, monotonicity
(reference breadth analog: the hypothesis-saturated tests/eval suite)."""

from __future__ import annotations

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from lkpy_tpu.data import ItemList
from lkpy_tpu.metrics.ranking import DCG, NDCG, RBP, Hit, Precision, Recall, RecipRank

FAST = settings(max_examples=50, deadline=None)


@st.composite
def rec_and_truth(draw, max_items=40):
    universe = list(range(1, max_items + 1))
    n_rec = draw(st.integers(0, 15))
    n_rel = draw(st.integers(1, 10))
    recs = draw(st.permutations(universe))[:n_rec]
    rel = draw(st.permutations(universe))[:n_rel]
    return (
        ItemList(item_ids=np.asarray(recs, np.int64), ordered=True),
        ItemList(item_ids=np.asarray(rel, np.int64)),
    )


METRICS = [NDCG(10), RBP(10), Precision(10), Recall(10), RecipRank(10), Hit(10)]


@FAST
@given(rec_and_truth())
def test_metrics_bounded_unit(data):
    recs, truth = data
    for m in METRICS:
        v = m.measure_list(recs, truth)
        if len(recs) == 0:
            # empty recommendation lists are undefined for precision-style
            # metrics (the reference returns NaN and collectors skip them)
            assert np.isnan(v) or 0.0 <= v <= 1.0
        else:
            assert 0.0 <= v <= 1.0, f"{type(m).__name__} = {v}"


@FAST
@given(st.integers(1, 10), st.integers(1, 40))
def test_perfect_ranking_scores_one(n_rel, max_items):
    assume(n_rel <= max_items)
    rel = np.arange(1, n_rel + 1, dtype=np.int64)
    recs = ItemList(item_ids=rel, ordered=True)
    truth = ItemList(item_ids=rel)
    assert NDCG(10).measure_list(recs, truth) == 1.0
    assert Hit(10).measure_list(recs, truth) == 1.0
    assert RecipRank(10).measure_list(recs, truth) == 1.0
    assert Recall(10).measure_list(recs, truth) == 1.0


@FAST
@given(rec_and_truth())
def test_no_hits_scores_zero(data):
    recs, truth = data
    assume(len(recs) > 0)
    # shift recommendations out of the universe so nothing hits
    miss = ItemList(item_ids=recs.ids() + 10_000, ordered=True)
    for m in METRICS:
        assert m.measure_list(miss, truth) == 0.0


@FAST
@given(rec_and_truth())
def test_promoting_a_hit_never_hurts(data):
    """Moving a relevant item one position up never decreases NDCG/RBP/
    RecipRank (rank-weighted metrics are monotone in hit positions)."""
    recs, truth = data
    ids = recs.ids().copy()
    rel = set(truth.ids().tolist())
    pos = [i for i, x in enumerate(ids) if x in rel and i > 0 and ids[i - 1] not in rel]
    assume(pos)
    p = pos[0]
    ids2 = ids.copy()
    ids2[p - 1], ids2[p] = ids2[p], ids2[p - 1]
    for m in (NDCG(10), RBP(10), RecipRank(10)):
        before = m.measure_list(ItemList(item_ids=ids, ordered=True), truth)
        after = m.measure_list(ItemList(item_ids=ids2, ordered=True), truth)
        assert after >= before - 1e-9


@FAST
@given(rec_and_truth())
def test_precision_recall_formulas(data):
    recs, truth = data
    assume(len(recs) > 0)
    k = 10
    top = recs.ids()[:k]
    hits = np.isin(top, truth.ids()).sum()
    assert Precision(k).measure_list(recs, truth) == hits / min(len(recs), k)
    assert Recall(k).measure_list(recs, truth) == hits / min(len(truth), k)


@FAST
@given(rec_and_truth())
def test_dcg_additivity(data):
    """DCG of a list = sum of the discounted gains of its hits."""
    recs, truth = data
    rel = set(truth.ids().tolist())
    # the reference's log-rank discount clamps ranks 1-2 to weight 1
    # (w = 1/log2(max(rank, 2)), _weighting.py semantics)
    disc = 1.0 / np.log2(np.maximum(np.arange(len(recs)) + 1, 2))
    want = sum(d for x, d in zip(recs.ids(), disc) if x in rel)
    got = DCG().measure_list(recs, truth)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


@FAST
@given(rec_and_truth())
def test_recip_rank_is_first_hit(data):
    recs, truth = data
    rel = set(truth.ids().tolist())
    first = next((i + 1 for i, x in enumerate(recs.ids()[:10]) if x in rel), None)
    got = RecipRank(10).measure_list(recs, truth)
    assert got == (1.0 / first if first else 0.0)
