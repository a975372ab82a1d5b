"""
ItemList edge cases and Arrow interop (VERDICT r2 #9; reference analog:
tests/data/test_itemlist.py in the reference suite, which is far larger).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from lkpy_tpu.data import ItemList, Vocabulary


def test_empty_list_basics():
    il = ItemList()
    assert len(il) == 0
    assert not il
    assert il.ids().shape == (0,)
    assert il.scores() is None
    assert il.to_df().shape[0] == 0


def test_empty_top_n():
    il = ItemList(item_ids=np.array([], dtype=np.int64), scores=np.array([], dtype=np.float32))
    assert len(il.top_n(5)) == 0


def test_top_n_without_scores_raises():
    with pytest.raises(ValueError, match="scores"):
        ItemList(item_ids=[1]).top_n(5)


def test_single_item():
    il = ItemList(item_ids=[7], scores=[1.5])
    assert len(il) == 1
    assert il
    assert il.ids()[0] == 7
    np.testing.assert_allclose(il.scores(), [1.5])


def test_top_n_nan_scores_excluded():
    il = ItemList(item_ids=[1, 2, 3, 4], scores=[1.0, np.nan, 3.0, 2.0])
    top = il.top_n(3)
    # NaN sorts out entirely (reference: _items.py:942 top_n drops NaN)
    assert list(top.ids()) == [3, 4, 1]


def test_top_n_larger_than_list():
    il = ItemList(item_ids=[1, 2], scores=[1.0, 2.0])
    top = il.top_n(10)
    assert list(top.ids()) == [2, 1]


def test_top_n_with_external_scores():
    il = ItemList(item_ids=[1, 2, 3])
    top = il.top_n(2, scores=np.array([0.1, 5.0, 3.0]))
    assert list(top.ids()) == [2, 3]


def test_remove_and_concat():
    a = ItemList(item_ids=[1, 2, 3, 4])
    b = ItemList(item_ids=[2, 4])
    assert list(a.remove(b).ids()) == [1, 3]
    c = ItemList(item_ids=[5])
    assert list(b.concat(c).ids()) == [2, 4, 5]


def test_isin_empty_other():
    a = ItemList(item_ids=[1, 2])
    assert not a.isin(ItemList()).any()


def test_numbers_with_vocabulary_and_missing():
    vocab = Vocabulary([10, 20, 30], "item")
    il = ItemList(item_ids=[20, 99], vocabulary=vocab)
    nums = il.numbers(missing="negative")
    assert nums[0] == 1
    assert nums[1] == -1


def test_from_df_with_rating_field():
    df = pd.DataFrame({"item_id": [5, 6], "rating": [3.0, 4.0], "score": [0.1, 0.2]})
    il = ItemList.from_df(df)
    np.testing.assert_allclose(il.field("rating"), [3.0, 4.0])
    np.testing.assert_allclose(il.scores(), [0.1, 0.2])


def test_arrow_round_trip():
    il = ItemList(item_ids=[1, 2, 3], scores=[0.5, 0.25, 0.125], ordered=True)
    tbl = il.to_arrow()
    assert isinstance(tbl, pa.Table)
    back = ItemList.from_arrow(tbl)
    assert list(back.ids()) == [1, 2, 3]
    np.testing.assert_allclose(back.scores(), [0.5, 0.25, 0.125])


def test_arrow_string_ids_round_trip():
    il = ItemList(item_ids=np.array(["x", "y"]), scores=[1.0, 2.0])
    back = ItemList.from_arrow(il.to_arrow())
    assert list(back.ids()) == ["x", "y"]


def test_getitem_slice_and_mask():
    il = ItemList(item_ids=[1, 2, 3, 4], scores=[1.0, 2.0, 3.0, 4.0])
    assert list(il[1:3].ids()) == [2, 3]
    mask = np.array([True, False, True, False])
    assert list(il[mask].ids()) == [1, 3]


def test_pickle_round_trip_preserves_fields():
    import pickle

    vocab = Vocabulary([1, 2, 3, 4], "item")
    il = ItemList(
        item_ids=[2, 3],
        vocabulary=vocab,
        scores=[0.5, 0.7],
        ordered=True,
        rank=np.array([1, 2], dtype=np.int32),
    )
    back = pickle.loads(pickle.dumps(il))
    assert list(back.ids()) == [2, 3]
    np.testing.assert_allclose(back.scores(), [0.5, 0.7])
    np.testing.assert_array_equal(back.ranks(), [1, 2])
    assert back.ordered


def test_duplicate_ids_kept():
    # ItemList does not dedupe (the reference keeps duplicates; selectors do
    # the dedup)
    il = ItemList(item_ids=[1, 1, 2])
    assert len(il) == 3


def test_scores_pandas_format():
    vocab = Vocabulary([1, 2], "item")
    il = ItemList(item_ids=[1, 2], vocabulary=vocab, scores=[0.1, 0.2])
    s = il.scores("pandas")
    assert isinstance(s, pd.Series)


def test_nums_only_list_with_explicit_vocabulary():
    """Regression (round-5 review): a nums-only list with no vocabulary of
    its own returns its stored numbers under an explicit vocabulary (they
    are interpreted as already being in that numbering) instead of raising."""
    vocab = Vocabulary([10, 20, 30, 40])
    il = ItemList(item_nums=[1, 3])
    nums = il.numbers(vocabulary=vocab)
    assert np.array_equal(nums, [1, 3])
    # scoring-path form used by every scorer
    nums2 = il.numbers(vocabulary=vocab, missing="negative")
    assert np.array_equal(nums2, [1, 3])
    # but a list with IDS still remaps through the explicit vocabulary
    il_ids = ItemList(item_ids=[20, 40])
    assert np.array_equal(il_ids.numbers(vocabulary=vocab), [1, 3])
