"""Additional metric correctness tests (reference themes: tests/eval/test_rank_*.py)."""

import numpy as np
import pytest

from lkpy_tpu.data import ItemList, ItemListCollection, Vocabulary
from lkpy_tpu.metrics import (
    DCG,
    NDCG,
    RBP,
    AveragePrecision,
    Hit,
    MeanPopRank,
    Precision,
    RankBiasedEntropy,
    Recall,
    RecipRank,
    RunAnalysis,
)
from lkpy_tpu.metrics._weighting import GeometricRankWeight, LogRankWeight
from lkpy_tpu.metrics.reranking import rank_biased_overlap


def ranked(ids):
    n = len(ids)
    return ItemList(item_ids=ids, ordered=True, rank=np.arange(1, n + 1), scores=np.linspace(1, 0.1, n))


# ---- empty / degenerate inputs (reference: metrics return sensible values) ----


def test_metrics_empty_recs():
    empty = ItemList(item_ids=np.array([], dtype=np.int64), ordered=True)
    test = ItemList(item_ids=[1, 2])
    assert Precision().measure_list(empty, test) == 0.0 or np.isnan(Precision().measure_list(empty, test))
    assert Recall().measure_list(empty, test) == 0.0
    assert Hit().measure_list(empty, test) == 0.0
    assert RecipRank().measure_list(empty, test) == 0.0
    assert NDCG().measure_list(empty, test) == 0.0


def test_metrics_empty_test():
    recs = ranked([1, 2, 3])
    empty = ItemList(item_ids=np.array([], dtype=np.int64))
    # no relevant items: ranking quality undefined or zero, must not raise
    for m in [NDCG(), AveragePrecision(), Recall()]:
        v = m.measure_list(recs, empty)
        assert np.isnan(v) or v == 0.0


# ---- truncation semantics (the @n variants) ----


def test_ndcg_truncation():
    # relevant item at rank 3; NDCG@2 must be 0
    recs = ranked([8, 9, 1])
    test = ItemList(item_ids=[1])
    assert NDCG(2).measure_list(recs, test) == 0.0
    assert NDCG(3).measure_list(recs, test) > 0.0


def test_precision_deep_n_penalizes():
    # Precision@4 with only 2 recs: reference counts len = n when truncating
    recs = ranked([1, 2])
    test = ItemList(item_ids=[1, 2])
    assert Precision().measure_list(recs, test) == pytest.approx(1.0)


def test_recip_rank_first_hit_only():
    recs = ranked([9, 1, 2])
    test = ItemList(item_ids=[1, 2])
    assert RecipRank().measure_list(recs, test) == pytest.approx(0.5)


def test_hit_k_window():
    recs = ranked([5, 6, 7, 1])
    test = ItemList(item_ids=[1])
    assert Hit(3).measure_list(recs, test) == 0.0
    assert Hit(4).measure_list(recs, test) == 1.0


# ---- rank weights ----


def test_log_rank_weight():
    w = LogRankWeight()
    np.testing.assert_allclose(w.weight(np.array([1, 2, 3])), [1.0, 1.0, 1 / np.log2(3)])


def test_log_rank_weight_offset():
    w = LogRankWeight(offset=1)
    np.testing.assert_allclose(w.weight(np.array([1, 2])), [1 / np.log2(2), 1 / np.log2(3)])


def test_geometric_rank_weight():
    w = GeometricRankWeight(0.5)
    np.testing.assert_allclose(w.weight(np.array([1, 2, 3])), [1.0, 0.5, 0.25])
    assert w.series_sum() == pytest.approx(2.0)


def test_ndcg_geometric_weight():
    recs = ranked([1, 9])
    test = ItemList(item_ids=[1, 9])
    # both relevant -> perfect regardless of weighting
    assert NDCG(weight=GeometricRankWeight()).measure_list(recs, test) == pytest.approx(1.0)


def test_dcg_log_base_e_differs():
    # hit at rank 3 (ranks 1-2 are clamped to weight 1 for every base)
    recs = ranked([8, 9, 1])
    test = ItemList(item_ids=[1])
    d2 = DCG().measure_list(recs, test)
    de = DCG(weight=LogRankWeight(base=np.e)).measure_list(recs, test)
    assert d2 == pytest.approx(1 / np.log2(3))
    assert de == pytest.approx(1 / np.log(3))
    assert de != pytest.approx(d2)


# ---- RBP ----


def test_rbp_rank2():
    recs = ranked([9, 1])
    test = ItemList(item_ids=[1])
    p = 0.85
    assert RBP().measure_list(recs, test) == pytest.approx((1 - p) * p)


def test_rbp_patience():
    recs = ranked([9, 1])
    test = ItemList(item_ids=[1])
    assert RBP(patience=0.5).measure_list(recs, test) == pytest.approx(0.5 * 0.5)


# ---- MAP edge semantics ----


def test_average_precision_no_hits():
    recs = ranked([7, 8])
    test = ItemList(item_ids=[1])
    assert AveragePrecision().measure_list(recs, test) == 0.0


# ---- MeanPopRank ----


def test_mean_pop_rank():
    from lkpy_tpu.data import from_interactions_df
    import pandas as pd

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2, 3],
            "item_id": [10, 20, 10, 30, 10],
            "rating": [3.0, 4.0, 5.0, 2.0, 4.0],
        }
    )
    ds = from_interactions_df(df)
    m = MeanPopRank(ds)
    # item 10 rated by 3 users (most popular), 20 and 30 by 1 each
    recs = ranked([10])
    v = m.measure_list(recs, ItemList(item_ids=[10]))
    assert v == pytest.approx(1.0)  # most popular -> popularity percentile 1


def test_rank_biased_entropy():
    recs = ranked([1, 2])
    cats = np.eye(2)
    rbe = RankBiasedEntropy(categories=lambda il: cats[: len(il)], patience=0.85)
    v = rbe.measure_list(recs, ItemList(item_ids=[1]))
    assert 0 < v <= 1.0 + 1e-9 or v == pytest.approx(1.0, rel=0.5)


# ---- RBO ----


def test_rbo_disjoint_zero():
    a = ranked([1, 2, 3])
    b = ranked([4, 5, 6])
    assert rank_biased_overlap(a, b, n=3) == pytest.approx(0.0)


def test_rbo_partial_between():
    a = ranked([1, 2, 3])
    b = ranked([1, 9, 8])
    v = rank_biased_overlap(a, b, n=3)
    assert 0 < v < 1


# ---- RunAnalysis with defaults/keys ----


def test_run_analysis_missing_test_list():
    outputs = ItemListCollection.from_dict({1: ranked([1]), 2: ranked([2])})
    test = ItemListCollection.from_dict({1: ItemList(item_ids=[1])})
    ra = RunAnalysis(Hit())
    res = ra.measure(outputs, test)
    lm = res.list_metrics()
    # user 2 has no test list; row should be missing or NaN, not crash
    assert len(lm) <= 2


def test_metric_labels_unique():
    ra = RunAnalysis(NDCG(), NDCG(10))
    labels = [m.label for m in ra.collector.metrics]
    assert len(set(labels)) == 2


def test_ils_hand_computed():
    """ILS = mean pairwise cosine (reference: metrics/_ils.py)."""
    from lkpy_tpu.metrics import ILS

    # orthogonal vectors -> ILS 0; identical -> 1
    recs = ItemList(item_ids=[1, 2], scores=[1.0, 0.5], vec=np.array([[1.0, 0.0], [0.0, 1.0]]))
    m = ILS(field="vec")
    assert m.measure_list(recs, ItemList()) == pytest.approx(0.0)

    recs2 = ItemList(item_ids=[1, 2, 3], scores=[1.0, 0.5, 0.2], vec=np.array([[1.0, 0.0]] * 3))
    assert m.measure_list(recs2, ItemList()) == pytest.approx(1.0)

    # 3 vectors: pairwise cosines (1,2)=0, (1,3)=cos45, (2,3)=cos45
    v = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    recs3 = ItemList(item_ids=[1, 2, 3], scores=[1.0, 0.5, 0.2], vec=v)
    expect = (0.0 + np.sqrt(0.5) + np.sqrt(0.5)) / 3
    assert m.measure_list(recs3, ItemList()) == pytest.approx(expect)


def test_ils_singleton_nan():
    from lkpy_tpu.metrics import ILS

    m = ILS(field="vec")
    one = ItemList(item_ids=[1], scores=[1.0], vec=np.array([[1.0, 0.0]]))
    assert np.isnan(m.measure_list(one, ItemList()))
