"""Property-based metric invariants (reference pattern: hypothesis use in
tests/eval; e.g. tests/eval/test_rank_ndcg.py strategies)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lkpy_tpu.data import ItemList
from lkpy_tpu.metrics import NDCG, RBP, AveragePrecision, Hit, Precision, Recall, RecipRank
from lkpy_tpu.testing.arrays import scored_lists


@st.composite
def recs_and_truth(draw, max_len=60):
    """An ordered rec list and a relevance list sharing some items."""
    n = draw(st.integers(1, max_len))
    ids = draw(st.lists(st.integers(1, 500), min_size=n, max_size=n, unique=True))
    recs = ItemList(
        item_ids=np.asarray(ids, dtype=np.int64),
        scores=np.linspace(1.0, 0.1, n, dtype=np.float32),
        ordered=True,
    )
    n_rel = draw(st.integers(1, 30))
    rel = draw(st.lists(st.integers(1, 500), min_size=n_rel, max_size=n_rel, unique=True))
    truth = ItemList(item_ids=np.asarray(rel, dtype=np.int64))
    return recs, truth


@given(recs_and_truth())
@settings(max_examples=50, deadline=None)
def test_rank_metrics_bounded(pair):
    recs, truth = pair
    for metric in (NDCG(), Precision(), Recall(), Hit(), RecipRank(), AveragePrecision(), RBP()):
        v = metric.measure_list(recs, truth)
        if not np.isnan(v):
            assert 0.0 <= v <= 1.0 + 1e-9, f"{type(metric).__name__} out of range: {v}"


@given(recs_and_truth())
@settings(max_examples=50, deadline=None)
def test_perfect_ranking_ndcg_one(pair):
    """Ranking exactly the relevant items first gives NDCG 1."""
    _, truth = pair
    perfect = ItemList(
        item_ids=truth.ids(),
        scores=np.linspace(1.0, 0.1, len(truth), dtype=np.float32),
        ordered=True,
    )
    np.testing.assert_allclose(NDCG().measure_list(perfect, truth), 1.0, rtol=1e-6)


@given(recs_and_truth())
@settings(max_examples=50, deadline=None)
def test_hit_matches_intersection(pair):
    recs, truth = pair
    hit = Hit().measure_list(recs, truth)
    inter = np.intersect1d(recs.ids(), truth.ids())
    assert hit == (1.0 if len(inter) else 0.0)


@given(recs_and_truth(), st.integers(1, 20))
@settings(max_examples=50, deadline=None)
def test_truncation_monotone_recall(pair, k):
    """Recall@k is non-decreasing in k."""
    recs, truth = pair
    r1 = Recall(k).measure_list(recs, truth)
    r2 = Recall(k + 5).measure_list(recs, truth)
    if not (np.isnan(r1) or np.isnan(r2)):
        assert r2 >= r1 - 1e-9


@given(scored_lists(scores="yes"))
@settings(max_examples=50, deadline=None)
def test_topn_is_subset(il):
    top = il.top_n(5)
    assert np.isin(top.ids(), il.ids()).all()
