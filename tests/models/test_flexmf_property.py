"""FlexMF model-function property tests: scoring formula, parameter
initialization, and training behavior on random data
(reference: flexmf/_model.py scoring, _training.py loop)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import jax
import jax.numpy as jnp

from lkpy_tpu.data import from_interactions_df
from lkpy_tpu.models.flexmf import (
    FlexMFExplicitScorer,
    FlexMFImplicitScorer,
    init_params,
    model_scores,
)
from lkpy_tpu.training import TrainingOptions

FAST = settings(max_examples=20, deadline=None)


@FAST
@given(
    st.integers(2, 20),
    st.integers(2, 20),
    st.sampled_from([2, 4, 8]),
    st.booleans(),
    st.booleans(),
    st.integers(0, 2**31 - 1),
)
def test_model_scores_formula(nu, ni, k, user_bias, item_bias, seed):
    params = init_params(jax.random.key(seed), nu, ni, k, user_bias, item_bias)
    rng = np.random.default_rng(seed)
    users = jnp.asarray(rng.integers(0, nu, 6).astype(np.int32))
    items = jnp.asarray(rng.integers(0, ni, 6).astype(np.int32))
    score, norm = model_scores(params, users, items)
    got = np.asarray(score)
    u = np.asarray(params["u_embed"])
    i = np.asarray(params["i_embed"])
    want = np.sum(u[np.asarray(users)] * i[np.asarray(items)], axis=-1)
    want_norm = np.sum(u[np.asarray(users)] ** 2, -1) + np.sum(i[np.asarray(items)] ** 2, -1)
    if user_bias:
        ub = np.asarray(params["u_bias"])[np.asarray(users)]
        want = want + ub
        want_norm = want_norm + ub**2
    if item_bias:
        ib = np.asarray(params["i_bias"])[np.asarray(items)]
        want = want + ib
        want_norm = want_norm + ib**2
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(norm), want_norm, rtol=1e-5, atol=1e-5)
    # the (B, N) candidate form agrees with the flat form
    score2, _ = model_scores(params, users, items[:, None])
    np.testing.assert_allclose(np.asarray(score2)[:, 0], got, rtol=1e-6)


@FAST
@given(st.integers(0, 2**31 - 1), st.sampled_from([2, 8, 16]))
def test_init_params_shapes_and_scale(seed, k):
    params = init_params(jax.random.key(seed), 30, 40, k, True, True, scale=0.1)
    assert params["u_embed"].shape == (30, k)
    assert params["i_embed"].shape == (40, k)
    assert params["u_bias"].shape == (30,)
    assert params["i_bias"].shape == (40,)
    # all tables initialize at the requested scale
    for name in ("u_embed", "i_embed", "u_bias", "i_bias"):
        sd = float(np.std(np.asarray(params[name])))
        assert 0.02 < sd < 0.3, name
    # no bias tables when not requested
    slim = init_params(jax.random.key(seed), 5, 5, k, False, False)
    assert set(slim) == {"u_embed", "i_embed"}


@st.composite
def small_datasets(draw):
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    nu, ni = 12, 15
    rows = []
    for u in range(nu):
        for i in rng.choice(ni, size=rng.integers(2, 6), replace=False):
            rows.append((u, int(i), float(rng.uniform(1, 5))))
    return pd.DataFrame(rows, columns=["user_id", "item_id", "rating"])


@settings(max_examples=5, deadline=None)
@given(small_datasets(), st.sampled_from(["logistic", "pairwise"]))
def test_implicit_training_reduces_loss(df, loss):
    ds = from_interactions_df(df)
    s = FlexMFImplicitScorer(
        FlexMFImplicitScorer.validate_config(
            {"embedding_size": 8, "epochs": 1, "loss": loss, "batch_size": 32}
        )
    )
    tr = s.create_trainer(ds, TrainingOptions(rng=42))
    first = tr.train_epoch()
    for _ in range(4):
        last = tr.train_epoch()
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first  # optimization makes progress on its own objective


@settings(max_examples=5, deadline=None)
@given(small_datasets())
def test_explicit_training_predicts_in_range(df):
    ds = from_interactions_df(df)
    s = FlexMFExplicitScorer(
        FlexMFExplicitScorer.validate_config({"embedding_size": 8, "epochs": 5, "batch_size": 32})
    )
    s.train(ds, TrainingOptions(rng=42))
    from lkpy_tpu.data import ItemList

    uid = int(df.user_id.iloc[0])
    out = s(uid, ItemList(item_ids=np.sort(df.item_id.unique()).astype(np.int64)))
    sc = out.scores()
    assert np.isfinite(sc).all()
    # biased regression on 1-5 ratings stays in a sane band
    assert sc.min() > -5 and sc.max() < 11
