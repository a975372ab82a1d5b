import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import Dataset, DatasetBuilder, from_interactions_df


@pytest.fixture
def simple_df():
    return pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2, 3],
            "item_id": [10, 20, 10, 30, 20],
            "rating": [4.0, 3.0, 5.0, 2.0, 1.0],
            "timestamp": [100, 200, 150, 250, 300],
        }
    )


def test_from_interactions(simple_df):
    ds = from_interactions_df(simple_df)
    assert ds.user_count == 3
    assert ds.item_count == 3
    assert ds.interaction_count == 5
    assert ds.users.ids.tolist() == [1, 2, 3]
    assert ds.items.ids.tolist() == [10, 20, 30]


def test_matrix(simple_df):
    ds = from_interactions_df(simple_df)
    m = ds.interaction_matrix()
    sp = m.scipy()
    assert sp.shape == (3, 3)
    assert sp.nnz == 5
    assert sp[0, 0] == 4.0  # user 1, item 10
    csr = m.csr()
    assert csr.nnz == 5
    assert "timestamp" in csr.fields


def test_user_row(simple_df):
    ds = from_interactions_df(simple_df)
    row = ds.user_row(2)
    assert row is not None
    assert sorted(row.ids().tolist()) == [10, 30]
    assert row.field("rating") is not None
    assert ds.user_row(99) is None


def test_stats(simple_df):
    ds = from_interactions_df(simple_df)
    istats = ds.item_stats()
    assert istats.loc[10, "count"] == 2
    assert istats.loc[30, "count"] == 1
    ustats = ds.user_stats()
    assert ustats.loc[1, "count"] == 2


def test_save_load(tmp_path, simple_df):
    ds = from_interactions_df(simple_df)
    ds.save(tmp_path / "ds")
    ds2 = Dataset.load(tmp_path / "ds")
    assert ds2.user_count == 3
    assert ds2.interaction_count == 5
    assert (ds2.interaction_matrix().scipy() != ds.interaction_matrix().scipy()).nnz == 0


def test_builder_attributes():
    dsb = DatasetBuilder("test")
    dsb.add_entities("item", [10, 20, 30])
    dsb.add_scalar_attribute("item", "title", [10, 20, 30], ["a", "b", "c"])
    dsb.add_interactions(
        "rating",
        pd.DataFrame({"user_id": [1, 2], "item_id": [10, 20], "rating": [3.0, 4.0]}),
        entities=["user", "item"],
        missing="insert",
    )
    ds = dsb.build()
    es = ds.entities("item")
    assert es.attribute("title").tolist() == ["a", "b", "c"]


def test_repeats_combining():
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "item_id": [10, 10, 20],
            "rating": [2.0, 4.0, 5.0],
        }
    )
    ds = from_interactions_df(df)
    m = ds.interaction_matrix()
    sp = m.scipy()
    assert sp.nnz == 2
    assert sp[0, 0] == pytest.approx(3.0)  # mean of 2,4


def test_negative_sampling(simple_df):
    ds = from_interactions_df(simple_df)
    m = ds.interaction_matrix()
    rng = np.random.default_rng(42)
    users = np.array([0, 1, 2] * 20)
    negs = m.sample_negatives(users, n=2, rng=rng)
    assert negs.shape == (60, 2)
    # none of the sampled items should be rated by the user
    for u, items in zip(users, negs):
        row = m.row_items(number=int(u))
        assert not np.isin(items, row.numbers()).any()


def test_movielens(ml_ds):
    assert ml_ds.user_count > 600
    assert ml_ds.item_count > 8000
    assert ml_ds.interaction_count == 100004 or ml_ds.interaction_count > 100000
    row = ml_ds.user_row(1)
    assert row is not None and len(row) > 0
    assert "title" in ml_ds.entities("item").attribute_names
