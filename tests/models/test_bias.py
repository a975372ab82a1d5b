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


def test_bias_items_only():
    """entities={'item'}: no user biases learned or applied
    (reference: tests/basic/test_bias.py test_bias_no_user)."""
    import pandas as pd

    from lkpy_tpu.data import from_interactions_df

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2, 3],
            "item_id": [10, 20, 10, 30, 20],
            "rating": [4.0, 3.0, 5.0, 2.0, 3.5],
        }
    )
    ds = from_interactions_df(df)
    model = BiasModel.learn(ds, 0.0, entities=frozenset({"item"}))
    assert model.user_biases is None
    assert model.item_biases is not None
    mu = df["rating"].mean()
    want_10 = (4.0 - mu + 5.0 - mu) / 2
    i10 = int(np.searchsorted(np.asarray(model.items.ids), 10))
    assert model.item_biases[i10] == pytest.approx(want_10, abs=1e-6)


def test_bias_users_only():
    import pandas as pd

    from lkpy_tpu.data import from_interactions_df

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2, 3],
            "item_id": [10, 20, 10, 30, 20],
            "rating": [4.0, 3.0, 5.0, 2.0, 3.5],
        }
    )
    ds = from_interactions_df(df)
    model = BiasModel.learn(ds, 0.0, entities=frozenset({"user"}))
    assert model.item_biases is None
    assert model.user_biases is not None
    # user bias = mean residual vs the global mean only (no item pass)
    mu = df["rating"].mean()
    want_u1 = ((4.0 - mu) + (3.0 - mu)) / 2
    u1 = int(np.searchsorted(np.asarray(model.users.ids), 1))
    assert model.user_biases[u1] == pytest.approx(want_u1, abs=1e-6)


def test_bias_separate_damping_forms():
    """dict and tuple damping apply per-entity values
    (reference: tests/basic/test_bias.py test_bias_separate_damping)."""
    import pandas as pd

    from lkpy_tpu.data import from_interactions_df

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2, 3, 3],
            "item_id": [10, 20, 10, 30, 20, 30],
            "rating": [4.0, 3.0, 5.0, 2.0, 3.5, 4.5],
        }
    )
    ds = from_interactions_df(df)
    m_dict = BiasModel.learn(ds, {"user": 10.0, "item": 2.0})
    m_tuple = BiasModel.learn(ds, (10.0, 2.0))  # (user, item) per reference
    assert np.allclose(m_dict.item_biases, m_tuple.item_biases)
    assert np.allclose(m_dict.user_biases, m_tuple.user_biases)
    # heavier user damping shrinks user biases more than item biases
    m_flat = BiasModel.learn(ds, 2.0)
    assert np.all(np.abs(m_dict.user_biases) <= np.abs(m_flat.user_biases) + 1e-9)
    assert np.allclose(m_dict.item_biases, m_flat.item_biases)


def test_users_only_model_folds_in_session_ratings():
    """A users-only bias model must still fold in session ratings — against
    the global mean alone (round-5 review; reference compute_for_items)."""
    import pandas as pd

    from lkpy_tpu.data import RecQuery, from_interactions_df
    from lkpy_tpu.models.bias import BiasScorer

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2, 3],
            "item_id": [10, 20, 10, 30, 20],
            "rating": [4.0, 3.0, 5.0, 2.0, 3.5],
        }
    )
    ds = from_interactions_df(df)
    sc = BiasScorer(damping=0.0, entities={"user"})
    sc.train(ds)
    mu = df["rating"].mean()
    hist = ItemList(item_ids=[10, 20], rating=np.array([5.0, 4.0]))
    out = sc(query=RecQuery(user_items=hist), items=ItemList(item_ids=[30]))
    want = mu + ((5.0 - mu) + (4.0 - mu)) / 2  # fold-in vs global mean only
    assert out.scores()[0] == pytest.approx(want, abs=1e-5)
