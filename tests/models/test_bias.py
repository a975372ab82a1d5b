import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import ItemList, RecQuery, from_interactions_df
from lkpy_tpu.models.bias import BiasModel, BiasScorer

simple_df = pd.DataFrame(
    {"user_id": [10, 12, 10, 13], "item_id": [1, 1, 2, 3], "rating": [4.0, 3.0, 5.0, 2.0]}
)


def test_bias_global_only():
    ds = from_interactions_df(simple_df)
    model = BiasModel.learn(ds, entities=frozenset())
    assert model.global_bias == pytest.approx(3.5)


def test_bias_means():
    ds = from_interactions_df(simple_df)
    model = BiasModel.learn(ds)
    assert model.global_bias == pytest.approx(3.5)
    # item biases: item 1: mean(4,3)-3.5 = 0; item 2: 1.5; item 3: -1.5
    assert model.item_biases == pytest.approx([0.0, 1.5, -1.5])
    # user biases on residuals: u10: mean(4-3.5-0, 5-3.5-1.5)=0.25; u12: -0.5; u13: 0
    assert model.user_biases == pytest.approx([0.25, -0.5, 0.0])


def test_bias_damping():
    ds = from_interactions_df(simple_df)
    model = BiasModel.learn(ds, damping=5.0)
    assert model.global_bias == pytest.approx(3.5)
    assert model.item_biases == pytest.approx([0.0, 1.5 / 6, -1.5 / 6])


def test_scorer_scores():
    ds = from_interactions_df(simple_df)
    s = BiasScorer()
    s.train(ds)
    out = s(query=10, items=ItemList(item_ids=[1, 2, 3]))
    exp_user = 0.25
    assert out.scores() == pytest.approx(np.array([3.5, 5.0, 2.0]) + exp_user, abs=1e-5)


def test_scorer_unknown_user():
    ds = from_interactions_df(simple_df)
    s = BiasScorer()
    s.train(ds)
    out = s(query=99, items=ItemList(item_ids=[1]))
    assert out.scores() == pytest.approx([3.5])


def test_scorer_unknown_item():
    ds = from_interactions_df(simple_df)
    s = BiasScorer()
    s.train(ds)
    out = s(query=12, items=ItemList(item_ids=[999]))
    assert out.scores() == pytest.approx([3.5 - 0.5])


def test_scorer_fold_in():
    ds = from_interactions_df(simple_df)
    s = BiasScorer()
    s.train(ds)
    hist = ItemList(item_ids=[2], rating=[5.0])
    q = RecQuery(user_items=hist)
    out = s(query=q, items=ItemList(item_ids=[1]))
    # user bias from history: (5 - 3.5 - 1.5)/1 = 0
    assert out.scores() == pytest.approx([3.5])


def test_ml_sane(ml_ds):
    s = BiasScorer(damping=5.0)
    s.train(ml_ds)
    m = s.model
    assert 3.0 < m.global_bias < 4.0
    assert np.all(np.abs(m.item_biases) < 3.0)
    assert np.all(np.abs(m.user_biases) < 3.0)
