"""
ItemListCollection layouts and Parquet round-trips (VERDICT r2 #9;
reference analog: tests/data/ collection tests over _collection/_base.py:48).
"""

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import ItemList, ItemListCollection


def make_ilc():
    ilc = ItemListCollection(["user_id"])
    ilc.add(ItemList(item_ids=[1, 2, 3], scores=[3.0, 2.0, 1.0], ordered=True), 100)
    ilc.add(ItemList(item_ids=[5], scores=[1.5], ordered=True), 200)
    ilc.add(ItemList(), 300)  # empty list
    return ilc


def test_parquet_round_trip_with_empty_lists(tmp_path):
    ilc = make_ilc()
    p = tmp_path / "ilc.parquet"
    ilc.save_parquet(p)
    back = ItemListCollection.load_parquet(p)
    assert back.key_fields == ("user_id",)
    assert len(back) == len(ilc)
    # all keys survive, including the empty list's
    assert {k[0] for k in back.keys()} == {100, 200, 300}
    empty = back.lookup(300)
    assert empty is not None and len(empty) == 0
    full = back.lookup(100)
    assert list(full.ids()) == [1, 2, 3]
    np.testing.assert_allclose(full.scores(), [3.0, 2.0, 1.0])


def test_parquet_key_from_metadata(tmp_path):
    """Key fields persist in the file metadata; load needs no key arg."""
    ilc = ItemListCollection(["part", "user_id"])
    ilc.add(ItemList(item_ids=[7]), "train", 1)
    ilc.add(ItemList(item_ids=[8, 9]), "test", 1)
    p = tmp_path / "multi.parquet"
    ilc.save_parquet(p)
    back = ItemListCollection.load_parquet(p)
    assert back.key_fields == ("part", "user_id")
    assert list(back.lookup("test", 1).ids()) == [8, 9]


def test_parquet_rank_and_extra_fields(tmp_path):
    ilc = ItemListCollection(["user_id"])
    ilc.add(
        ItemList(
            item_ids=[4, 5],
            scores=[2.0, 1.0],
            ordered=True,
            rank=np.array([1, 2], dtype=np.int32),
        ),
        9,
    )
    p = tmp_path / "ranked.parquet"
    ilc.save_parquet(p)
    back = ItemListCollection.load_parquet(p)
    il = back.lookup(9)
    assert il.ordered
    np.testing.assert_array_equal(il.ranks(), [1, 2])


def test_from_df_groups_by_key():
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "item_id": [10, 11, 12],
            "score": [1.0, 0.5, 2.0],
        }
    )
    ilc = ItemListCollection.from_df(df, ["user_id"])
    assert len(ilc) == 2
    assert list(ilc.lookup(1).ids()) == [10, 11]


def test_from_dict_and_lookup_projected():
    ilc = ItemListCollection.from_dict(
        {1: ItemList(item_ids=[5]), 2: ItemList(item_ids=[6])}, key="user_id"
    )
    assert len(ilc) == 2
    # projection from a larger key type
    from collections import namedtuple

    BigKey = namedtuple("BigKey", ["user_id", "fold"])
    il = ilc.lookup_projected(BigKey(2, 7))
    assert list(il.ids()) == [6]


def test_to_df_round_trips_through_from_df():
    ilc = ItemListCollection(["user_id"])
    ilc.add(ItemList(item_ids=[1, 2], scores=[0.5, 0.25], ordered=True), 11)
    ilc.add(ItemList(item_ids=[3], scores=[1.0], ordered=True), 22)
    df = ilc.to_df()
    back = ItemListCollection.from_df(df, ["user_id"])
    assert len(back) == 2
    np.testing.assert_allclose(back.lookup(11).scores(), [0.5, 0.25])


def test_add_from_with_extra_key_field():
    a = ItemListCollection(["user_id"])
    a.add(ItemList(item_ids=[1]), 5)
    b = ItemListCollection(["fold", "user_id"])
    b.add_from(a, fold=3)
    assert list(b.lookup(3, 5).ids()) == [1]


def test_string_keys_round_trip(tmp_path):
    ilc = ItemListCollection(["user_id"])
    ilc.add(ItemList(item_ids=["a", "b"]), "alice")
    p = tmp_path / "strk.parquet"
    ilc.save_parquet(p)
    back = ItemListCollection.load_parquet(p)
    assert list(back.lookup("alice").ids()) == ["a", "b"]


def test_load_parquet_explicit_key_overrides(tmp_path):
    ilc = make_ilc()
    p = tmp_path / "ilc.parquet"
    ilc.save_parquet(p)
    back = ItemListCollection.load_parquet(p, key=["user_id"])
    assert back.key_fields == ("user_id",)
