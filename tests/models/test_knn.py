import numpy as np
import pickle
import pytest

from lkpy_tpu.data import ItemList, RecQuery
from lkpy_tpu.metrics import quick_measure_model
from lkpy_tpu.models.knn import ItemKNNScorer, UserKNNScorer
from lkpy_tpu.training import TrainingOptions


@pytest.fixture(scope="module")
def iknn(ml_ds):
    s = ItemKNNScorer()
    s.train(ml_ds, TrainingOptions(rng=42))
    return s


@pytest.fixture(scope="module")
def uknn(ml_ds):
    s = UserKNNScorer()
    s.train(ml_ds, TrainingOptions(rng=42))
    return s


def test_config_aliases():
    s = ItemKNNScorer(k=30)
    assert s.config.max_nbrs == 30
    s2 = UserKNNScorer(nnbrs=15)
    assert s2.config.max_nbrs == 15


def test_iknn_trains(iknn, ml_ds):
    assert iknn.sim_table.n_items == ml_ds.item_count
    assert (iknn.sim_table.sims >= 0).all()
    # sims sorted descending per row
    d = np.diff(iknn.sim_table.sims, axis=1)
    assert (d <= 1e-6).all()


def test_iknn_scores(iknn, ml_ds):
    hist = ml_ds.user_row(1)
    q = RecQuery(user_id=1, user_items=hist)
    out = iknn(query=q, items=ItemList(item_ids=[31, 1029, 999999]))
    s = out.scores()
    assert np.isnan(s[2])
    finite = np.isfinite(s[:2])
    # predictions in plausible rating range where finite
    assert (s[:2][finite] > 0).all() and (s[:2][finite] < 6).all()


def test_iknn_no_history(iknn):
    out = iknn(query=RecQuery(), items=ItemList(item_ids=[31]))
    assert np.isnan(out.scores()).all()


def test_iknn_pickle(iknn, ml_ds):
    i2 = pickle.loads(pickle.dumps(iknn))
    hist = ml_ds.user_row(1)
    q = RecQuery(user_items=hist)
    items = ItemList(item_ids=[31, 1029])
    np.testing.assert_allclose(
        i2(query=q, items=items).scores(), iknn(query=q, items=items).scores(), equal_nan=True
    )


def test_uknn_scores(uknn, ml_ds):
    hist = ml_ds.user_row(1)
    q = RecQuery(user_id=1, user_items=hist)
    out = uknn(query=q, items=ItemList(item_ids=[31, 1029]))
    s = out.scores()
    finite = np.isfinite(s)
    assert (s[finite] > 0).all() and (s[finite] < 6).all()


def test_uknn_no_history(uknn):
    out = uknn(query=RecQuery(), items=ItemList(item_ids=[31]))
    assert np.isnan(out.scores()).all()


@pytest.mark.eval
def test_iknn_explicit_gate(ml_dense_ds):
    """Reference gates: ItemKNN explicit RMSE 0.85-0.95, NDCG@20 >= 0.03
    (tests/models/test_knn_item_item.py:65-66).  Run on the density-matched
    subset (see ml_dense_ds) where the ML-100K thresholds transfer."""
    res = quick_measure_model(ItemKNNScorer(), ml_dense_ds, predicts_ratings=True, rng=42, user_frac=0.5)
    summary = res.list_summary()
    assert 0.8 <= summary.loc["RMSE", "mean"] <= 1.0
    assert summary.loc["NDCG@20", "mean"] >= 0.03


@pytest.mark.eval
def test_iknn_implicit_gate(ml_ds):
    """Reference gate: ItemKNN implicit NDCG@20 >= 0.10
    (tests/models/test_knn_item_item.py:95)."""
    res = quick_measure_model(ItemKNNScorer(feedback="implicit"), ml_ds, rng=42, user_frac=0.5)
    assert res.list_summary().loc["NDCG@20", "mean"] >= 0.10


@pytest.mark.eval
def test_uknn_explicit_gate(ml_dense_ds):
    """Reference gates: UserKNN explicit RMSE 0.855-0.965, NDCG@20 >= 0.03
    (tests/models/test_knn_user_user.py:37,79).  Density-matched subset."""
    res = quick_measure_model(UserKNNScorer(), ml_dense_ds, predicts_ratings=True, rng=42, user_frac=0.5)
    summary = res.list_summary()
    assert 0.8 <= summary.loc["RMSE", "mean"] <= 1.0
    assert summary.loc["NDCG@20", "mean"] >= 0.03


@pytest.mark.eval
def test_uknn_implicit_gate(ml_ds):
    res = quick_measure_model(UserKNNScorer(feedback="implicit"), ml_ds, rng=42, user_frac=0.5)
    assert res.list_summary().loc["NDCG@20", "mean"] >= 0.03
