"""Dataset builder + save/load property tests over random datasets
(reference breadth analog: tests/data/test_builder*.py + container IO)."""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from lkpy_tpu.data import Dataset, DatasetBuilder, from_interactions_df

FAST = settings(max_examples=15, deadline=None)


@st.composite
def rating_frames(draw, with_rating=True, with_time=False):
    nu = draw(st.integers(1, 10))
    ni = draw(st.integers(1, 12))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(nu):
        for i in rng.choice(ni, size=rng.integers(1, ni + 1), replace=False):
            rows.append((u + 100, int(i) + 500))
    df = pd.DataFrame(rows, columns=["user_id", "item_id"])
    if with_rating:
        df["rating"] = rng.uniform(0.5, 5.0, len(df)).astype(np.float32)
    if with_time:
        df["timestamp"] = rng.integers(0, 10_000, len(df))
    return df


def matrix_df(ds):
    m = ds.interaction_matrix()
    csr = m.csr("rating")
    coo = csr.to_coo()
    out = pd.DataFrame(
        {
            "user_id": np.asarray(ds.users.ids)[coo.row],
            "item_id": np.asarray(ds.items.ids)[coo.col],
        }
    )
    if coo.values is not None:
        out["rating"] = coo.values
    return out.sort_values(["user_id", "item_id"]).reset_index(drop=True)


@FAST
@given(rating_frames())
def test_from_interactions_df_preserves_everything(df):
    ds = from_interactions_df(df)
    assert ds.user_count == df.user_id.nunique()
    assert ds.item_count == df.item_id.nunique()
    got = matrix_df(ds)
    want = df.sort_values(["user_id", "item_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["user_id", "item_id"]], want[["user_id", "item_id"]], check_dtype=False
    )
    np.testing.assert_allclose(got.rating.to_numpy(), want.rating.to_numpy(), rtol=1e-6)


@FAST
@given(rating_frames(with_time=True))
def test_save_load_round_trip(df):
    ds = from_interactions_df(df)
    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / "ds"
        ds.save(path)
        back = Dataset.load(path)
    assert back.user_count == ds.user_count
    assert back.item_count == ds.item_count
    np.testing.assert_array_equal(back.users.ids, ds.users.ids)
    np.testing.assert_array_equal(back.items.ids, ds.items.ids)
    pd.testing.assert_frame_equal(matrix_df(back), matrix_df(ds), check_dtype=False)


@FAST
@given(rating_frames())
def test_builder_scalar_attribute_round_trip(df):
    item_ids = np.sort(df.item_id.unique())
    years = 1990 + (item_ids % 30)
    db = DatasetBuilder()
    db.add_entities("item", item_ids)
    db.add_entities("user", np.sort(df.user_id.unique()))
    db.add_interactions("rating", df, entities=("user", "item"))
    db.add_scalar_attribute("item", "year", item_ids, years)
    ds = db.build()
    attr = ds.entities("item").attribute("year")
    # the series is in vocabulary (number) order; item_ids is sorted, which
    # IS the vocabulary order
    np.testing.assert_array_equal(np.asarray(attr), years)


@FAST
@given(rating_frames(), st.floats(1.0, 4.5))
def test_binarize_remove(df, min_rating):
    db = DatasetBuilder()
    db.add_interactions("rating", df, entities=("user", "item"), missing="insert")
    db.binarize_ratings(min_rating=min_rating, method="remove")
    ds = db.build()
    kept = (df.rating >= min_rating).sum()
    assert ds.interaction_count == kept


@FAST
@given(rating_frames(with_time=True), st.integers(0, 10_000))
def test_filter_interactions_by_time(df, cut):
    db = DatasetBuilder()
    db.add_interactions("rating", df, entities=("user", "item"), missing="insert")
    db.filter_interactions(max_time=cut)
    ds = db.build()
    assert ds.interaction_count == (df.timestamp < cut).sum()
