"""
Query coercion and one-shot operation semantics
(reference: tests/test_query.py over src/lenskit/data/_query.py and the
operations surface src/lenskit/operations.py:18,63,102).
"""

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu import predict, recommend, score, topn_pipeline
from lkpy_tpu.data import ItemList, RecQuery, from_interactions_df
from lkpy_tpu.models.basic import PopScorer
from lkpy_tpu.models.bias import BiasScorer


def test_query_create_none():
    q = RecQuery.create(None)
    assert q.user_id is None
    assert q.user_items is None


def test_query_create_passthrough():
    q = RecQuery(user_id=42)
    assert RecQuery.create(q) is q


def test_query_create_from_user_id():
    q = RecQuery.create(17)
    assert q.user_id == 17
    assert q.query_id == 17
    assert q.user_items is None
    qs = RecQuery.create("alice")
    assert qs.user_id == "alice"


def test_query_create_from_history():
    hist = ItemList(item_ids=[1, 2, 3])
    q = RecQuery.create(hist)
    assert q.user_id is None
    assert q.user_items is hist
    # query_items is the 2026.1 alias for the same list
    assert q.query_items is hist


@pytest.fixture(scope="module")
def tiny_ds():
    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 30, n),
            "item_id": rng.integers(100, 140, n),
            "rating": rng.integers(1, 6, n).astype(np.float64),
        }
    ).drop_duplicates(["user_id", "item_id"])
    return from_interactions_df(df)


@pytest.fixture(scope="module")
def bias_pipe(tiny_ds):
    pipe = topn_pipeline(BiasScorer(), predicts_ratings=True, n=5)
    pipe.train(tiny_ds)
    return pipe


def test_recommend_by_user_id(bias_pipe, tiny_ds):
    recs = recommend(bias_pipe, 3, n=5)
    assert isinstance(recs, ItemList)
    assert len(recs) == 5
    assert recs.ordered
    # training items are excluded from recommendations
    seen = set(tiny_ds.user_row(3).ids())
    assert not (set(recs.ids()) & seen)


def test_recommend_overrides_n(bias_pipe):
    assert len(recommend(bias_pipe, 3, n=2)) == 2


def test_recommend_unknown_user(bias_pipe):
    # an unknown user still gets (bias-only) recommendations
    recs = recommend(bias_pipe, 99999, n=5)
    assert len(recs) == 5


def test_score_returns_scores_for_requested_items(bias_pipe, tiny_ds):
    items = ItemList(item_ids=tiny_ds.items.ids[:4])
    out = score(bias_pipe, 3, items)
    assert list(out.ids()) == list(items.ids())
    s = out.scores()
    assert s is not None and np.all(np.isfinite(s))


def test_predict_matches_bias_model(bias_pipe, tiny_ds):
    items = ItemList(item_ids=tiny_ds.items.ids[:4])
    out = predict(bias_pipe, 3, items)
    s = out.scores()
    assert s is not None
    # rating predictions stay in the feasible rating range for a bias model
    assert np.all(s > 0) and np.all(s < 6.5)


def test_recommend_with_history_query(tiny_ds):
    # history-only query (no user ID): Pop still recommends, excluding the
    # session history (reference: operations.recommend accepts ItemList input)
    pipe = topn_pipeline(PopScorer(), n=5)
    pipe.train(tiny_ds)
    hist = ItemList(item_ids=tiny_ds.items.ids[:3])
    recs = recommend(pipe, hist, n=5)
    assert len(recs) == 5
    assert not (set(recs.ids()) & set(hist.ids()))


def test_recommend_candidate_override(bias_pipe, tiny_ds):
    # an explicit candidate set restricts recommendations to it
    cands = ItemList(item_ids=tiny_ds.items.ids[:6])
    recs = recommend(bias_pipe, 3, n=5, items=cands)
    assert set(recs.ids()) <= set(cands.ids())
