"""
Closed-form oracle tests for the linear family (VERDICT r2 #9).

EASE has an exact closed form (Steck 2019; reference: knn/ease.py:183):
B = I − P·diagMat(1/diag(P)) with P = (XᵀX + λI)⁻¹ and diag(B) = 0 — our
implementation must match a from-scratch numpy evaluation exactly.
"""

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import ItemList, RecQuery, from_interactions_df
from lkpy_tpu.models.ease import EASEScorer


@pytest.fixture(scope="module")
def ds():
    rng = np.random.default_rng(123)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, 600),
            "item_id": rng.integers(0, 30, 600),
        }
    ).drop_duplicates()
    return from_interactions_df(df)


def ease_oracle(X: np.ndarray, lam: float) -> np.ndarray:
    G = X.T @ X + lam * np.eye(X.shape[1])
    P = np.linalg.inv(G)
    B = -P / np.diag(P)[None, :]
    np.fill_diagonal(B, 0.0)
    return B


def test_ease_matches_closed_form(ds):
    lam = 3.0
    s = EASEScorer(EASEScorer.validate_config({"regularization": lam}))
    s.train(ds)
    X = np.asarray(ds.interaction_matrix().scipy(attribute=None).todense())
    B = ease_oracle(X.astype(np.float64), lam)
    np.testing.assert_allclose(np.asarray(s.weights), B, atol=1e-4)


def test_ease_scores_are_xb(ds):
    lam = 3.0
    s = EASEScorer(EASEScorer.validate_config({"regularization": lam}))
    s.train(ds)
    X = np.asarray(ds.interaction_matrix().scipy(attribute=None).todense())
    B = ease_oracle(X.astype(np.float64), lam)
    # pick a user history and check predicted scores = x_u @ B
    unum = 0
    hist_items = ds.items.ids[X[unum] > 0]
    q = RecQuery(user_items=ItemList(item_ids=hist_items))
    targets = ds.items.ids[:10]
    out = s(query=q, items=ItemList(item_ids=targets))
    exp = X[unum] @ B
    tnums = ds.items.numbers(targets)
    np.testing.assert_allclose(out.scores(), exp[tnums], atol=1e-3)


def test_ease_regularization_shrinks_weights(ds):
    s1 = EASEScorer(EASEScorer.validate_config({"regularization": 0.5}))
    s1.train(ds)
    s2 = EASEScorer(EASEScorer.validate_config({"regularization": 50.0}))
    s2.train(ds)
    assert np.abs(np.asarray(s2.weights)).sum() < np.abs(np.asarray(s1.weights)).sum()


def test_userknn_explicit_oracle():
    """UserKNN explicit prediction matches a hand-rolled mean-centered
    cosine-weighted average (reference semantics, knn/user.py:76)."""
    from lkpy_tpu.models.knn import UserKNNScorer

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4],
            "item_id": [10, 11, 12, 10, 11, 13, 10, 12, 13, 11, 12],
            "rating": [4.0, 3.0, 5.0, 4.0, 3.5, 2.0, 5.0, 4.0, 3.0, 2.0, 4.0],
        }
    )
    ds = from_interactions_df(df)
    s = UserKNNScorer(UserKNNScorer.validate_config({"max_nbrs": 10, "min_nbrs": 1}))
    s.train(ds)

    # numpy oracle
    X = np.zeros((4, 4))
    M = np.zeros((4, 4), dtype=bool)
    for _, r in df.iterrows():
        u = ds.users.number(r.user_id)
        i = ds.items.number(r.item_id)
        X[u, i] = r.rating
        M[u, i] = True
    means = X.sum(axis=1) / M.sum(axis=1)
    C = np.where(M, X - means[:, None], 0.0)
    norms = np.linalg.norm(C, axis=1)
    U = C / norms[:, None]

    # find an unrated (user, item) pair with at least one positive-similarity
    # neighbor and check the prediction against the hand formula
    checked = 0
    for uid in [1, 2, 3, 4]:
        q_u = ds.users.number(uid)
        sims = U @ U[q_u]
        sims[q_u] = 0.0
        for iid in [10, 11, 12, 13]:
            tgt = ds.items.number(iid)
            if M[q_u, tgt]:
                continue
            nbrs = [v for v in range(4) if M[v, tgt] and sims[v] > 1e-6]
            # the scorer takes the query history explicitly (pipeline's
            # history-lookup supplies it; reference knn/user.py:76)
            hist = ds.user_row(uid)
            out = s(RecQuery(user_id=uid, user_items=hist), ItemList(item_ids=[iid]))
            if not nbrs:
                assert np.isnan(out.scores()[0])
                continue
            expected = means[q_u] + sum(sims[v] * C[v, tgt] for v in nbrs) / sum(
                sims[v] for v in nbrs
            )
            assert out.scores()[0] == pytest.approx(expected, abs=1e-4), (uid, iid)
            checked += 1
    assert checked >= 1  # at least one real prediction verified
