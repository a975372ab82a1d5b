"""DatasetBuilder attribute/transform coverage and ItemListCollection IO
(reference: tests/data/test_dataset_*.py, tests/data/test_ilc_*.py patterns)."""

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import DatasetBuilder, ItemList, ItemListCollection


def _ratings():
    return pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2, 3, 3, 3],
            "item_id": [10, 20, 10, 30, 20, 30, 40],
            "rating": [4.0, 3.0, 5.0, 2.0, 1.0, 4.5, 3.5],
            "timestamp": [100, 200, 150, 250, 300, 350, 400],
        }
    )


def _build(df=None):
    df = _ratings() if df is None else df
    b = DatasetBuilder()
    b.add_entities("user", np.unique(df["user_id"]))
    b.add_entities("item", np.unique(df["item_id"]))
    b.add_interactions("rating", df, entities=("user", "item"))
    return b


def test_scalar_attribute_roundtrip():
    b = _build()
    b.add_scalar_attribute("item", "year", [10, 20, 30, 40], [1999, 2005, 2010, 2020])
    ds = b.build()
    ent = ds.entities("item")
    years = ent.attribute("year")
    assert years.iloc[ds.items.number(10)] == 1999
    assert years.iloc[ds.items.number(40)] == 2020


def test_scalar_attribute_from_series():
    b = _build()
    b.add_scalar_attribute("item", "year", pd.Series([1999, 2005], index=[10, 20]))
    ds = b.build()
    years = ds.entities("item").attribute("year")
    assert years.iloc[ds.items.number(10)] == 1999
    # unset entities are missing
    assert pd.isna(years.iloc[ds.items.number(30)])


def test_list_attribute():
    b = _build()
    b.add_list_attribute("item", "genres", [10, 30], [["a", "b"], ["c"]])
    ds = b.build()
    genres = ds.entities("item").attribute("genres")
    assert genres.iloc[ds.items.number(10)] == ["a", "b"]
    assert genres.iloc[ds.items.number(30)] == ["c"]
    assert genres.iloc[ds.items.number(20)] is None


def test_vector_attribute():
    b = _build()
    vecs = np.arange(8, dtype=np.float32).reshape(4, 2)
    b.add_vector_attribute("item", "embed", [10, 20, 30, 40], vecs)
    ds = b.build()
    emb = ds.entities("item").attribute("embed")
    np.testing.assert_allclose(emb.iloc[ds.items.number(20)], [2.0, 3.0])


def test_filter_interactions_time_window():
    b = _build()
    b.filter_interactions(min_time=150, max_time=350)
    ds = b.build()
    # rows at t=100, 350, 400 are dropped
    assert ds.interaction_count == 4


def test_filter_interactions_remove_pairs():
    b = _build()
    b.filter_interactions(remove=pd.DataFrame({"user_id": [1, 3], "item_id": [10, 40]}))
    ds = b.build()
    assert ds.interaction_count == 5
    row = ds.user_row(1)
    assert 10 not in row.ids()


def test_binarize_remove():
    b = _build()
    b.binarize_ratings(min_rating=3.0, method="remove")
    ds = b.build()
    assert ds.interaction_count == 5  # ratings < 3.0 dropped
    log = ds.interactions().pandas()
    assert "rating" not in log.columns


def test_binarize_zero():
    b = _build()
    b.binarize_ratings(min_rating=3.0, method="zero")
    ds = b.build()
    log = ds.interactions().pandas()
    r = log["rating"].to_numpy()
    assert set(np.unique(r)) <= {0.0, 1.0}
    assert r.sum() == 5


def test_ilc_parquet_roundtrip(tmp_path):
    ilc = ItemListCollection(["user_id"])
    ilc.add(ItemList(item_ids=[1, 2, 3], scores=[0.5, 0.4, 0.3], ordered=True), 1)
    ilc.add(ItemList(item_ids=[7], scores=[1.0]), 2)
    ilc.add(ItemList(), 3)
    f = tmp_path / "ilc.parquet"
    ilc.save_parquet(f)
    back = ItemListCollection.load_parquet(f)
    assert len(back) == len(ilc)
    assert back.key_fields == ("user_id",)
    l1 = back.lookup(1)
    assert list(l1.ids()) == [1, 2, 3]
    np.testing.assert_allclose(l1.scores(), [0.5, 0.4, 0.3])
    assert len(back.lookup(3)) == 0


def test_ilc_df_roundtrip():
    ilc = ItemListCollection(["user_id"])
    ilc.add(ItemList(item_ids=[1, 2], scores=[0.9, 0.1]), 5)
    ilc.add(ItemList(item_ids=[3], scores=[0.7]), 6)
    df = ilc.to_df()
    back = ItemListCollection.from_df(df, key="user_id")
    assert len(back) == 2
    np.testing.assert_allclose(back.lookup(5).scores(), [0.9, 0.1])


def test_ilc_lookup_projected():
    ilc = ItemListCollection(["user_id", "fold"])
    ilc.add(ItemList(item_ids=[1]), 1, 0)
    full_key = next(ilc.keys())
    assert ilc.lookup_projected(full_key) is not None


def test_dataset_save_load_preserves_attributes(tmp_path):
    b = _build()
    b.add_scalar_attribute("item", "year", [10, 20, 30, 40], [1999, 2005, 2010, 2020])
    ds = b.build()
    from lkpy_tpu.data import Dataset

    ds.save(tmp_path / "ds")
    back = Dataset.load(tmp_path / "ds")
    assert back.interaction_count == ds.interaction_count
    years = back.entities("item").attribute("year")
    assert years.iloc[back.items.number(30)] == 2010
