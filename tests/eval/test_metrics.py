import numpy as np
import pytest

from lkpy_tpu.data import ItemList, ItemListCollection, Vocabulary
from lkpy_tpu.metrics import (
    DCG,
    MAE,
    NDCG,
    RBP,
    RMSE,
    AveragePrecision,
    Entropy,
    ExposureGini,
    Hit,
    ListGini,
    Precision,
    Recall,
    RecipRank,
    RunAnalysis,
)
from lkpy_tpu.metrics.reranking import least_item_promoted, rank_biased_overlap


def ranked(ids):
    n = len(ids)
    return ItemList(item_ids=ids, ordered=True, rank=np.arange(1, n + 1), scores=np.linspace(1, 0.1, n))


def test_precision_recall():
    recs = ranked([1, 2, 3, 4])
    test = ItemList(item_ids=[2, 4, 5])
    assert Precision().measure_list(recs, test) == pytest.approx(0.5)
    assert Recall().measure_list(recs, test) == pytest.approx(2 / 3)
    assert Precision(2).measure_list(recs, test) == pytest.approx(0.5)
    assert Recall(2).measure_list(recs, test) == pytest.approx(1 / 3)


def test_hit_reciprank():
    recs = ranked([9, 2, 3])
    test = ItemList(item_ids=[3])
    assert Hit().measure_list(recs, test) == 1.0
    assert Hit(2).measure_list(recs, test) == 0.0
    assert RecipRank().measure_list(recs, test) == pytest.approx(1 / 3)
    assert RecipRank().measure_list(recs, ItemList(item_ids=[100])) == 0.0


def test_ndcg_binary_perfect():
    recs = ranked([1, 2])
    test = ItemList(item_ids=[1, 2])
    assert NDCG().measure_list(recs, test) == pytest.approx(1.0)


def test_ndcg_binary_hand_computed():
    # relevant at ranks 1 and 3 out of 3 recs; test has 2 items
    recs = ranked([1, 9, 2])
    test = ItemList(item_ids=[1, 2])
    dcg = 1.0 + 1.0 / np.log2(3)
    idcg = 1.0 + 1.0  # ranks 1, 2 both weight 1 (log2(2)=1)
    assert NDCG().measure_list(recs, test) == pytest.approx(dcg / idcg)


def test_ndcg_graded():
    recs = ranked([1, 2])
    test = ItemList(item_ids=[2, 1], rating=[4.0, 2.0])
    dcg = 2.0 + 4.0  # both weight 1 at ranks 1-2
    idcg = 4.0 + 2.0
    assert NDCG(gain="rating").measure_list(recs, test) == pytest.approx(dcg / idcg)


def test_dcg():
    recs = ranked([1, 9, 2])
    test = ItemList(item_ids=[1, 2])
    assert DCG().measure_list(recs, test) == pytest.approx(1 + 1 / np.log2(3))


def test_average_precision():
    recs = ranked([1, 9, 2, 8])
    test = ItemList(item_ids=[1, 2])
    # hits at rank 1 (prec 1/1) and rank 3 (prec 2/3); denom = min(2,4)
    assert AveragePrecision().measure_list(recs, test) == pytest.approx((1 + 2 / 3) / 2)


def test_rbp():
    recs = ranked([1, 2])
    test = ItemList(item_ids=[1])
    p = 0.85
    expected = (1 - p) * 1.0  # hit at rank 1: p^0
    assert RBP().measure_list(recs, test) == pytest.approx(expected)


def test_rmse_mae():
    out = ItemList(item_ids=[1, 2, 3], scores=[3.0, 4.0, 5.0])
    test = ItemList(item_ids=[1, 2, 3], rating=[3.0, 3.0, 3.0])
    assert RMSE().measure_list(out, test) == pytest.approx(np.sqrt((0 + 1 + 4) / 3))
    assert MAE().measure_list(out, test) == pytest.approx(1.0)


def test_rmse_missing_error():
    out = ItemList(item_ids=[1], scores=[np.nan])
    test = ItemList(item_ids=[1], rating=[3.0])
    with pytest.raises(ValueError):
        RMSE().measure_list(out, test)
    assert np.isnan(RMSE(missing_scores="ignore").measure_list(out, test))


def test_gini_metrics():
    vocab = Vocabulary([1, 2, 3, 4])
    outputs = ItemListCollection.from_dict(
        {
            "u1": ranked([1, 2]),
            "u2": ranked([1, 2]),
            "u3": ranked([1, 3]),
        }
    )
    test = ItemListCollection.from_dict({"u1": ItemList(item_ids=[1])})
    lg = ListGini(items=vocab).measure_run(outputs, test)
    assert 0 < lg < 1
    eg = ExposureGini(items=vocab).measure_run(outputs, test)
    assert 0 < eg < 1


def test_entropy():
    recs = ranked([1, 2, 3, 4])
    cats = np.eye(4)
    e = Entropy(categories=lambda il: cats[: len(il)]).measure_list(recs, ItemList(item_ids=[1]))
    assert e == pytest.approx(2.0)  # uniform over 4 categories


def test_run_analysis():
    outputs = ItemListCollection.from_dict({1: ranked([1, 2]), 2: ranked([3, 4])})
    test = ItemListCollection.from_dict({1: ItemList(item_ids=[1]), 2: ItemList(item_ids=[9])})
    ra = RunAnalysis(NDCG(), Precision(), Hit())
    res = ra.measure(outputs, test)
    df = res.list_summary()
    assert df.loc["NDCG", "mean"] == pytest.approx(0.5)
    assert df.loc["Hit", "mean"] == pytest.approx(0.5)
    lm = res.list_metrics()
    assert len(lm) == 2


def test_rbo_identical():
    # identical lists score exactly 1.0 (reference: _rbo.py normalization)
    a = ranked([1, 2, 3])
    assert rank_biased_overlap(a, a, n=3) == pytest.approx(1.0)


def test_lip():
    # item 5 sits at base index 4; promoted into top-3 -> 4 - 3 = 1 beyond n
    orig = ranked([1, 2, 3, 4, 5])
    rr = ranked([5, 1, 2])
    assert least_item_promoted(orig, rr, n=3) == 1.0
    # nothing promoted from beyond n -> 0
    assert least_item_promoted(orig, ranked([1, 2, 3]), n=3) == 0.0
