"""Bias-model property tests: damped-mean formulas against a numpy oracle
(reference semantics: basic/bias.py:35 ``BiasModel.learn``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from lkpy_tpu.data import ItemList, from_interactions_df
from lkpy_tpu.models.bias import BiasModel, BiasScorer

FAST = settings(max_examples=20, deadline=None)


@st.composite
def rating_frames(draw):
    nu = draw(st.integers(2, 12))
    ni = draw(st.integers(2, 15))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(nu):
        for i in rng.choice(ni, size=rng.integers(1, ni + 1), replace=False):
            rows.append((u, int(i), float(rng.uniform(0.5, 5.0))))
    return pd.DataFrame(rows, columns=["user_id", "item_id", "rating"])


def oracle_bias(df, damping):
    g = df.rating.mean()
    r = df.rating - g
    i_sum = r.groupby(df.item_id).sum()
    i_cnt = df.groupby("item_id").size()
    ib = (i_sum / (i_cnt + damping)).reindex(sorted(df.item_id.unique())).to_numpy()
    r2 = r - pd.Series(ib, index=sorted(df.item_id.unique())).reindex(df.item_id).to_numpy()
    u_sum = r2.groupby(df.user_id).sum()
    u_cnt = df.groupby("user_id").size()
    ub = (u_sum / (u_cnt + damping)).reindex(sorted(df.user_id.unique())).to_numpy()
    return g, ib, ub


@FAST
@given(rating_frames(), st.floats(0.0, 25.0))
def test_learn_matches_oracle(df, damping):
    ds = from_interactions_df(df)
    model = BiasModel.learn(ds, damping=damping)
    g, ib, ub = oracle_bias(df, damping)
    np.testing.assert_allclose(model.global_bias, g, rtol=1e-5)
    np.testing.assert_allclose(model.item_biases, ib, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(model.user_biases, ub, rtol=1e-4, atol=1e-5)


@FAST
@given(rating_frames())
def test_zero_damping_residual_means(df):
    """With damping 0, per-item residual means are exactly the item biases,
    so re-centering by them zeroes the item-grouped residuals."""
    ds = from_interactions_df(df)
    model = BiasModel.learn(ds, damping=0.0)
    item_ids = sorted(df.item_id.unique())
    resid = df.rating - model.global_bias - pd.Series(
        model.item_biases, index=item_ids
    ).reindex(df.item_id).to_numpy()
    means = resid.groupby(df.item_id).mean()
    np.testing.assert_allclose(means.to_numpy(), 0.0, atol=1e-5)


@FAST
@given(rating_frames(), st.floats(0.0, 10.0))
def test_scorer_prediction_formula(df, damping):
    """BiasScorer prediction = global + item + user bias for known pairs."""
    ds = from_interactions_df(df)
    s = BiasScorer(damping=damping)
    s.train(ds)
    m = s.model
    uid = int(df.user_id.iloc[0])
    items = ItemList(item_ids=np.asarray(sorted(df.item_id.unique()), np.int64))
    out = s(uid, items)
    un = ds.users.number(uid)
    want = m.global_bias + m.item_biases + m.user_biases[un]
    np.testing.assert_allclose(out.scores(), want.astype(np.float32), rtol=1e-5, atol=1e-5)


@FAST
@given(rating_frames())
def test_unknown_items_get_damped_fallback(df):
    ds = from_interactions_df(df)
    s = BiasScorer(damping=5.0)
    s.train(ds)
    items = ItemList(item_ids=np.asarray([999_999], np.int64))
    out = s(int(df.user_id.iloc[0]), items)
    # unknown items score global + user bias (item bias 0)
    m = s.model
    un = ds.users.number(int(df.user_id.iloc[0]))
    np.testing.assert_allclose(
        out.scores(), np.float32(m.global_bias + m.user_biases[un]), rtol=1e-5
    )
