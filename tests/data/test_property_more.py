"""
Hypothesis property tests over ItemList / ItemListCollection / Vocabulary.

Deepens the property coverage to match how the reference leans on its
array strategies across its data tests
(reference: src/lenskit/testing/_arrays.py:25-91 used throughout
tests/data/test_itemlist.py and friends); VERDICT r3 #9.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from lkpy_tpu.data import ItemList, ItemListCollection, Vocabulary
from lkpy_tpu.data.collection import ArrayTopNILC
from lkpy_tpu.testing.arrays import scored_lists

# keep per-test budget small; these run inside the normal CPU suite
_PROP = settings(max_examples=40, deadline=None)


@_PROP
@given(scored_lists())
def test_itemlist_df_roundtrip_preserves(il):
    df = il.to_df(numbers=False)
    back = ItemList.from_df(df)
    assert np.array_equal(back.ids(), il.ids())
    if il.scores() is not None:
        np.testing.assert_array_equal(back.scores(), il.scores())


@_PROP
@given(scored_lists(scores="yes"), st.integers(1, 120))
def test_topn_is_sorted_prefix_of_sort(il, n):
    """top_n(n) == the first n rows of the full descending sort."""
    top = il.top_n(n)
    order = np.argsort(-il.scores(), kind="stable")
    expect = il.ids()[order][:n]
    assert np.array_equal(top.ids(), expect)


@_PROP
@given(scored_lists())
def test_remove_then_isin_empty(il):
    """Removing a list from itself leaves nothing behind."""
    kept = il.remove(il)
    assert len(kept) == 0


@_PROP
@given(scored_lists(), scored_lists())
def test_isin_matches_numpy(a, b):
    got = a.isin(b)
    expect = np.isin(a.ids(), b.ids())
    assert np.array_equal(got, expect)


@_PROP
@given(st.lists(st.integers(0, 10_000), min_size=0, max_size=200, unique=True))
def test_vocab_numbers_invert_ids(ids):
    v = Vocabulary(np.asarray(ids, dtype=np.int64))
    nums = v.numbers(np.asarray(ids, dtype=np.int64))
    assert np.array_equal(v.id_array(nums), np.asarray(ids))
    # numbering is dense and within range
    assert len(set(nums.tolist())) == len(ids)
    if len(ids):
        assert nums.min() >= 0 and nums.max() < len(v)


@_PROP
@given(
    st.lists(st.integers(0, 5_000), min_size=1, max_size=100, unique=True),
    st.lists(st.integers(5_001, 10_000), min_size=0, max_size=20, unique=True),
)
def test_vocab_missing_negative(known, unknown):
    v = Vocabulary(np.asarray(known, dtype=np.int64))
    probe = np.asarray(known + unknown, dtype=np.int64)
    nums = v.numbers(probe, missing="negative")
    assert np.all(nums[: len(known)] >= 0)
    assert np.all(nums[len(known) :] < 0)


@_PROP
@given(st.lists(scored_lists(max_len=20), min_size=0, max_size=10))
def test_ilc_roundtrips_df(lists):
    ilc = ItemListCollection(["user_id"])
    for i, il in enumerate(lists):
        ilc.add(il, i)
    assert len(ilc) == len(lists)
    assert ilc.total_items() == sum(len(il) for il in lists)
    df = ilc.to_df()
    # empty lists vanish from the long layout; all other rows survive
    assert len(df) == ilc.total_items()
    for i, il in enumerate(lists):
        got = ilc.lookup(i)
        assert got is il


@_PROP
@given(
    st.integers(1, 30),  # n lists
    st.integers(1, 20),  # list length
    st.data(),
)
def test_array_topn_ilc_matches_eager(n_lists, n, data):
    """The lazy array-backed ILC must be indistinguishable from an eagerly
    built one (the serving path switched to it in round 4)."""
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    vocab = Vocabulary(np.arange(100, dtype=np.int64))
    nums = rng.integers(0, 100, size=(n_lists, n)).astype(np.int32)
    scores = -np.sort(-rng.normal(size=(n_lists, n)).astype(np.float32), axis=1)
    lengths = rng.integers(0, n + 1, size=n_lists)
    keys = [int(k) for k in rng.choice(10_000, size=n_lists, replace=False)]

    lazy = ArrayTopNILC(["user_id"], keys, nums, scores, lengths, vocab)
    eager = ItemListCollection(["user_id"])
    for i, k in enumerate(keys):
        ln = int(lengths[i])
        eager.add(
            ItemList(
                item_nums=nums[i, :ln],
                vocabulary=vocab,
                scores=scores[i, :ln],
                ordered=True,
                rank=np.arange(1, ln + 1, dtype=np.int32),
            ),
            k,
        )
    assert len(lazy) == len(eager)
    assert lazy.total_items() == eager.total_items()
    for k in keys:
        a, b = lazy.lookup(k), eager.lookup(k)
        assert np.array_equal(a.ids(), b.ids())
        np.testing.assert_array_equal(a.scores(), b.scores())
        assert np.array_equal(a.ranks(), b.ranks())
    df_a = lazy.to_df().reset_index(drop=True)
    df_b = eager.to_df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        df_a[["user_id", "item_id", "score"]].astype({"user_id": np.int64}),
        df_b[["user_id", "item_id", "score"]].astype({"user_id": np.int64}),
        check_dtype=False,
    )
