import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import DatasetBuilder, ItemList
from lkpy_tpu.metrics import quick_measure_model
from lkpy_tpu.models.fair import FAIRReranker
from lkpy_tpu.models.nmf import NMFScorer
from lkpy_tpu.models.svd import BiasedSVDScorer
from lkpy_tpu.training import TrainingOptions


def test_svd_trains(ml_ds):
    s = BiasedSVDScorer(features=10)
    s.train(ml_ds, TrainingOptions(rng=42))
    out = s(query=1, items=ItemList(item_ids=[31, 1029]))
    sc = out.scores()
    assert np.isfinite(sc).all()
    assert (sc > 0).all() and (sc < 6).all()


def test_nmf_trains(ml_ds):
    s = NMFScorer(features=10, max_iter=50)
    s.train(ml_ds, TrainingOptions(rng=42))
    out = s(query=1, items=ItemList(item_ids=[31, 1029]))
    assert np.isfinite(out.scores()).all()
    assert (s.user_components >= 0).all()
    assert (s.item_components >= 0).all()


def _fair_ds():
    dsb = DatasetBuilder()
    items = np.arange(100)
    dsb.add_entities("item", items)
    dsb.add_scalar_attribute("item", "protected", items, items < 30)
    df = pd.DataFrame({"user_id": np.repeat(np.arange(10), 10), "item_id": np.tile(np.arange(100, step=10), 10)})
    dsb.add_interactions("click", df, entities=["user", "item"], missing="insert")
    return dsb.build()


def test_fair_reranker():
    ds = _fair_ds()
    rr = FAIRReranker(n=10, p=0.5, alpha=0.1)
    rr.train(ds)
    # candidate list: all unprotected first (worst case)
    ids = np.concatenate([np.arange(30, 80), np.arange(0, 30)])
    il = ItemList(item_ids=ids, scores=np.linspace(1, 0, len(ids)))
    out = rr(il.top_n(), n=10)
    assert len(out) == 10
    prot_count = np.sum(out.ids() < 30)
    # quota forces some protected items into the top-10
    m10 = rr.m_list[9]
    assert prot_count >= m10
    assert out.ordered


def test_fair_requires_attribute(ml_ds):
    rr = FAIRReranker(n=10)
    with pytest.raises(ValueError):
        rr.train(ml_ds)


@pytest.mark.eval
def test_svd_gate(ml_ds):
    """Reference gate: BiasedSVD RMSE 0.915-0.925 on ML-100K
    (tests/sklearn/test_svd.py:32); wider window on ml-latest-small."""
    res = quick_measure_model(BiasedSVDScorer(), ml_ds, predicts_ratings=True, rng=42, user_frac=0.5)
    rmse = res.list_summary().loc["RMSE", "mean"]
    assert 0.85 <= rmse <= 1.0


@pytest.mark.eval
def test_nmf_gate(ml_dense_ds):
    """Reference gate: NMF NDCG >= 0.22 (tests/sklearn/test_nmf.py:31);
    density-matched subset."""
    res = quick_measure_model(NMFScorer(), ml_dense_ds, rng=42, user_frac=0.5)
    assert res.list_summary().loc["NDCG@20", "mean"] >= 0.15


def _fair_rand_ds(items, protected):
    dsb = DatasetBuilder()
    dsb.add_entities("item", items)
    dsb.add_scalar_attribute("item", "protected", items, protected)
    df = pd.DataFrame({"user_id": np.zeros(len(items), np.int64), "item_id": items})
    dsb.add_interactions("click", df, entities=["user", "item"], missing="insert")
    return dsb.build()


@pytest.mark.parametrize("n,p,alpha", [(20, 0.5, 0.2), (50, 0.5, 0.1), (100, 0.1, 0.3)])
def test_fair_constraints_hold_at_every_prefix(n, p, alpha):
    """The cumulative protected count must satisfy the m_list quota at every
    rank (reference: tests/reranking/test_fair_reranker.py
    test_randomized_reranking)."""
    rng = np.random.default_rng(42)
    items = rng.permutation(n + 10)
    protected = rng.random(n + 10) < p
    ds = _fair_rand_ds(items, protected)
    rr = FAIRReranker(n=n, p=p, alpha=alpha)
    rr.train(ds)
    out = rr(ItemList(item_ids=items, ordered=True))
    ids = out.ids()
    assert len(out) == n
    assert len(set(ids.tolist())) == n  # no duplicates
    prot_ids = set(items[protected].tolist())
    counts = np.cumsum([int(i in prot_ids) for i in ids])
    assert np.all(counts >= rr.m_list[: len(counts)])


def test_fair_all_unprotected_is_noop():
    """With no protected items the reranker preserves the input order
    (reference: test_fair_reranker.py test_all_unprotected_items)."""
    items = np.arange(6, 18)
    ds = _fair_rand_ds(items, np.zeros(len(items), dtype=bool))
    rr = FAIRReranker(n=12, p=0.5, alpha=0.1)
    rr.train(ds)
    out = rr(ItemList(item_ids=items, ordered=True), n=6)
    assert np.array_equal(out.ids(), items[:6])
