"""ItemListCollection property tests: construction, lookup, iteration,
df/parquet round-trips over randomly generated collections
(reference test breadth analog: tests/data/test_collection*.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from lkpy_tpu.data import ItemList, ItemListCollection
from lkpy_tpu.testing.arrays import scored_lists

FAST = settings(max_examples=30, deadline=None)


@st.composite
def collections(draw, max_lists=8):
    n = draw(st.integers(0, max_lists))
    keys = draw(st.lists(st.integers(1, 1000), min_size=n, max_size=n, unique=True))
    ilc = ItemListCollection(["user_id"])
    lists = {}
    for k in keys:
        il = draw(scored_lists(max_len=20))
        ilc.add(il, k)
        lists[k] = il
    return ilc, lists


@FAST
@given(collections())
def test_lookup_returns_added_lists(data):
    ilc, lists = data
    assert len(ilc) == len(lists)
    for k, il in lists.items():
        got = ilc.lookup(k)
        assert got is not None
        np.testing.assert_array_equal(got.ids(), il.ids())
        s1, s2 = got.scores(), il.scores()
        assert (s1 is None) == (s2 is None)
        if s1 is not None:
            np.testing.assert_array_equal(s1, s2)


@FAST
@given(collections())
def test_iteration_orders_match(data):
    ilc, lists = data
    keys_iter = [k for k, _ in ilc.items()]
    assert keys_iter == list(ilc.keys())
    assert len(list(ilc.lists())) == len(ilc)
    assert ilc.total_items() == sum(len(il) for il in lists.values())


@FAST
@given(collections())
def test_df_round_trip(data):
    ilc, lists = data
    nonempty = {k: il for k, il in lists.items() if len(il)}
    df = ilc.to_df()
    assert len(df) == sum(len(il) for il in nonempty.values())
    if len(df):
        back = ItemListCollection.from_df(df, ["user_id"])
        for k, il in nonempty.items():
            got = back.lookup(k)
            assert got is not None
            assert set(got.ids().tolist()) == set(il.ids().tolist())


@FAST
@given(collections())
def test_parquet_round_trip(data):
    import tempfile
    from pathlib import Path

    ilc, lists = data
    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / "out.parquet"
        ilc.save_parquet(path)
        back = ItemListCollection.load_parquet(path)
    # empty lists are preserved (the reference records empty-list keys)
    assert set(back.keys()) == set(ilc.keys())
    for k, il in lists.items():
        got = back.lookup(k)
        assert got is not None
        np.testing.assert_array_equal(np.sort(got.ids()), np.sort(il.ids()))
    del back


@FAST
@given(collections(), collections())
def test_add_from_merges(a, b):
    ilc_a, lists_a = a
    ilc_b, lists_b = b
    merged = ItemListCollection(["user_id"])
    merged.add_from(ilc_a)
    merged.add_from(ilc_b)
    assert len(merged) == len(ilc_a) + len(ilc_b)


@FAST
@given(collections())
def test_from_dict_equivalent(data):
    ilc, lists = data
    d = {(k,): il for k, il in lists.items()}
    built = ItemListCollection.from_dict(d, key=["user_id"])
    assert set(built.keys()) == set(ilc.keys())


@FAST
@given(st.integers(0, 50), st.integers(1, 20))
def test_projection_between_key_schemas(n_users, n_items):
    """lookup_projected drops extra key fields (crossfold partition keys)."""
    wide = ItemListCollection(["part", "user_id"])
    for u in range(n_users):
        wide.add(ItemList(item_ids=np.arange(1, n_items + 1)), u % 3, u)
    narrow = ItemListCollection(["user_id"])
    for u in range(n_users):
        narrow.add(ItemList(item_ids=np.arange(1, n_items + 1)), u)
    for key, il in wide.items():
        got = narrow.lookup_projected(key)
        assert got is not None and len(got) == n_items
