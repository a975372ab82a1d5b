import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import ItemList, RecQuery, from_interactions_df
from lkpy_tpu.metrics import quick_measure_model
from lkpy_tpu.models.association import AssociationScorer
from lkpy_tpu.models.ease import EASEScorer
from lkpy_tpu.models.slim import SLIMScorer

simple_df = pd.DataFrame(
    {
        "user_id": [1, 1, 2, 2, 3, 3, 4],
        "item_id": [10, 20, 10, 20, 10, 30, 30],
    }
)


def test_ease_simple():
    ds = from_interactions_df(simple_df)
    s = EASEScorer()
    s.train(ds)
    assert np.allclose(np.diag(s.weights), 0.0)
    q = RecQuery(user_items=ItemList(item_ids=[10]))
    out = s(query=q, items=ItemList(item_ids=[20, 30]))
    sc = out.scores()
    # item 20 co-occurs with 10 twice, item 30 once
    assert sc[0] > sc[1]


def test_ease_no_history():
    ds = from_interactions_df(simple_df)
    s = EASEScorer()
    s.train(ds)
    out = s(query=RecQuery(), items=ItemList(item_ids=[20]))
    assert np.isnan(out.scores()).all()


def test_association_probability():
    ds = from_interactions_df(simple_df)
    s = AssociationScorer()
    s.train(ds)
    # P[20|10] = cooc(10,20)/count(10) = 2/3
    sp = s.assoc_scores
    n10 = ds.items.number(10)
    n20 = ds.items.number(20)
    assert sp[n10, n20] == pytest.approx(2 / 3)
    q = RecQuery(user_items=ItemList(item_ids=[10]))
    out = s(query=q, items=ItemList(item_ids=[20, 30]))
    assert out.scores()[0] == pytest.approx(2 / 3)
    assert out.scores()[1] == pytest.approx(1 / 3)


def test_association_lift():
    ds = from_interactions_df(simple_df)
    s = AssociationScorer(method="lift")
    s.train(ds)
    n10 = ds.items.number(10)
    n20 = ds.items.number(20)
    # lift = P(10,20)/(P10*P20) = (2/4)/((3/4)*(2/4)) = 4/3
    assert s.assoc_scores[n10, n20] == pytest.approx(4 / 3)


def test_slim_simple():
    ds = from_interactions_df(simple_df)
    s = SLIMScorer(l1_reg=0.01, l2_reg=0.01, max_iters=200)
    s.train(ds)
    # weights nonneg, zero diagonal
    w = s.weights.to_scipy().toarray()
    assert (w >= 0).all()
    assert np.allclose(np.diag(w), 0)
    q = RecQuery(user_items=ItemList(item_ids=[10]))
    out = s(query=q, items=ItemList(item_ids=[20, 30]))
    assert np.isfinite(out.scores()).all()


def slim_oracle_cd(A, l1, l2, iters=500):
    """Sequential Gauss-Seidel CD exactly as accel/slim/mod.rs."""
    n_users, n_items = A.shape
    W = np.zeros((n_items, n_items))
    for item in range(n_items):
        w = np.zeros(n_items)
        resid = A[:, item].astype(np.float64).copy()
        active = [j for j in range(n_items) if j != item and (A[:, j] * A[:, item]).sum() > 0]
        for _ in range(iters):
            dmax = 0.0
            for j in active:
                nz = A[:, j] > 0
                upd = np.sum(resid[nz] + w[j])
                if upd >= l1:
                    new = (upd - l1) / (nz.sum() + l2)
                else:
                    new = 0.0
                diff = new - w[j]
                w[j] = new
                resid[nz] -= diff
                dmax = max(dmax, abs(diff))
            if dmax <= 1e-6:
                break
        W[:, item] = w
    return W


def test_slim_matches_cd_oracle():
    """FISTA solves the same objective as the reference's CD (documented
    deviation: iteration path differs, optimum matches)."""
    rng = np.random.default_rng(42)
    A = (rng.uniform(size=(30, 12)) < 0.3).astype(np.float32)
    df = pd.DataFrame({"user_id": np.nonzero(A)[0], "item_id": np.nonzero(A)[1]})
    ds = from_interactions_df(df)
    s = SLIMScorer(l1_reg=0.5, l2_reg=0.5, max_iters=500)
    s.train(ds)
    w_mine = s.weights.to_scipy().toarray()
    # ds vocab is sorted by item id == column order already
    w_oracle = slim_oracle_cd(A[:, sorted(df.item_id.unique())], 0.5, 0.5)
    np.testing.assert_allclose(w_mine, w_oracle, atol=5e-3)


@pytest.mark.eval
def test_ease_gate(ml_ds):
    """Reference gate: EASE NDCG >= 0.01 (tests/knn/test_ease.py:44)."""
    res = quick_measure_model(EASEScorer(), ml_ds, rng=42, user_frac=0.5)
    assert res.list_summary().loc["NDCG@20", "mean"] >= 0.01


@pytest.mark.eval
def test_association_gate(ml_ds):
    """Reference gate: association NDCG >= 0.01 (tests/knn/test_association.py:15,23)."""
    res = quick_measure_model(AssociationScorer(), ml_ds, rng=42, user_frac=0.5)
    assert res.list_summary().loc["NDCG@20", "mean"] >= 0.01


@pytest.mark.eval
@pytest.mark.slow
def test_slim_gate(ml_dense_ds):
    """Reference gate: SLIM NDCG 0.2-0.4 (tests/models/test_slim.py:37);
    density-matched subset."""
    res = quick_measure_model(SLIMScorer(), ml_dense_ds, rng=42, user_frac=0.5)
    ndcg = res.list_summary().loc["NDCG@20", "mean"]
    assert 0.15 <= ndcg <= 0.45
