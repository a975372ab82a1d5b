"""ItemList operation tests (reference test themes: tests/data/test_itemlist.py)."""

import numpy as np
import pandas as pd
import pickle
import pytest

from lkpy_tpu.data import ItemList, Vocabulary


@pytest.fixture
def vocab():
    return Vocabulary([10, 20, 30, 40, 50], name="item")


def test_empty_list():
    il = ItemList()
    assert len(il) == 0
    assert not il
    assert il.ids().size == 0
    assert il.field_names == []


def test_ids_and_numbers(vocab):
    il = ItemList(item_ids=[20, 40, 10], vocabulary=vocab)
    np.testing.assert_array_equal(il.ids(), [20, 40, 10])
    np.testing.assert_array_equal(il.numbers(), [1, 3, 0])


def test_from_numbers_resolves_ids(vocab):
    il = ItemList(item_nums=[4, 0], vocabulary=vocab)
    np.testing.assert_array_equal(il.ids(), [50, 10])


def test_numbers_without_vocab_errors():
    il = ItemList(item_ids=[1, 2])
    with pytest.raises(RuntimeError):
        il.numbers()


def test_numbers_revocabulary(vocab):
    il = ItemList(item_ids=[20, 40], vocabulary=vocab)
    v2 = Vocabulary([40, 20, 99])  # sorted -> [20, 40, 99]
    np.testing.assert_array_equal(il.numbers(vocabulary=v2), [0, 1])


def test_numbers_missing_negative(vocab):
    il = ItemList(item_ids=[20, 40])
    v2 = Vocabulary([20])
    nums = il.numbers(vocabulary=v2, missing="negative")
    np.testing.assert_array_equal(nums, [0, -1])


def test_scores_and_fields():
    il = ItemList(item_ids=[1, 2, 3], scores=[0.5, 0.2, 0.9], rating=[3.0, 4.0, 5.0])
    np.testing.assert_allclose(il.scores(), [0.5, 0.2, 0.9])
    np.testing.assert_allclose(il.field("rating"), [3.0, 4.0, 5.0])
    assert set(il.field_names) == {"score", "rating"}
    assert il.field("nonexistent") is None


def test_scores_pandas_format():
    il = ItemList(item_ids=[1, 2], scores=[0.5, 0.2])
    s = il.scores(format="pandas")
    assert isinstance(s, pd.Series)


def test_top_n_orders_by_score():
    il = ItemList(item_ids=[1, 2, 3, 4], scores=[0.1, 0.9, float("nan"), 0.5])
    top = il.top_n(2)
    np.testing.assert_array_equal(top.ids(), [2, 4])
    np.testing.assert_array_equal(top.ranks(), [1, 2])
    assert top.ordered


def test_top_n_excludes_nan_scores():
    il = ItemList(item_ids=[1, 2, 3], scores=[np.nan, np.nan, 0.5])
    top = il.top_n(3)
    np.testing.assert_array_equal(top.ids(), [3])


def test_top_n_all():
    il = ItemList(item_ids=[5, 6, 7], scores=[1.0, 3.0, 2.0])
    top = il.top_n()
    np.testing.assert_array_equal(top.ids(), [6, 7, 5])


def test_top_n_external_scores():
    il = ItemList(item_ids=[1, 2, 3], scores=[0.0, 0.0, 0.0])
    top = il.top_n(2, scores=np.array([3.0, 1.0, 2.0]))
    np.testing.assert_array_equal(top.ids(), [1, 3])


def test_isin_remove():
    a = ItemList(item_ids=[1, 2, 3, 4])
    b = ItemList(item_ids=[2, 4, 9])
    np.testing.assert_array_equal(a.isin(b), [False, True, False, True])
    np.testing.assert_array_equal(a.remove(b).ids(), [1, 3])


def test_concat_keeps_fields():
    a = ItemList(item_ids=[1, 2], scores=[0.1, 0.2])
    b = ItemList(item_ids=[3], scores=[0.3])
    c = a.concat(b)
    np.testing.assert_array_equal(c.ids(), [1, 2, 3])
    np.testing.assert_allclose(c.scores(), [0.1, 0.2, 0.3])


def test_getitem_mask_and_slice():
    il = ItemList(item_ids=[1, 2, 3, 4], scores=[0.1, 0.2, 0.3, 0.4])
    sub = il[np.array([True, False, True, False])]
    np.testing.assert_array_equal(sub.ids(), [1, 3])
    np.testing.assert_allclose(sub.scores(), [0.1, 0.3])
    sub2 = il[1:3]
    np.testing.assert_array_equal(sub2.ids(), [2, 3])


def test_df_round_trip():
    il = ItemList(item_ids=[7, 8], scores=[1.5, 2.5], rating=[1.0, 2.0])
    df = il.to_df(numbers=False)
    assert "item_id" in df.columns and "score" in df.columns
    il2 = ItemList.from_df(df)
    np.testing.assert_array_equal(il2.ids(), il.ids())
    np.testing.assert_allclose(il2.scores(), il.scores())
    np.testing.assert_allclose(il2.field("rating"), [1.0, 2.0])


def test_from_vocabulary(vocab):
    il = ItemList.from_vocabulary(vocab)
    assert len(il) == 5
    np.testing.assert_array_equal(il.numbers(), np.arange(5))


def test_pickle_round_trip(vocab):
    il = ItemList(item_ids=[20, 30], scores=[0.3, 0.6], vocabulary=vocab)
    il2 = pickle.loads(pickle.dumps(il))
    np.testing.assert_array_equal(il2.ids(), il.ids())
    np.testing.assert_allclose(il2.scores(), il.scores())
    np.testing.assert_array_equal(il2.numbers(), il.numbers())


def test_string_ids():
    il = ItemList(item_ids=["a", "b", "c"])
    v = Vocabulary(["c", "a", "b"], reorder=True)
    np.testing.assert_array_equal(il.numbers(vocabulary=v), [0, 1, 2])


def test_clone_independent():
    il = ItemList(item_ids=[1, 2], scores=[0.1, 0.2])
    c = il.clone()
    np.testing.assert_array_equal(c.ids(), il.ids())


def test_ranks_only_when_ordered():
    il = ItemList(item_ids=[1, 2])
    assert il.ranks() is None
    ranked = ItemList(item_ids=[1, 2], ordered=True, rank=[1, 2])
    np.testing.assert_array_equal(ranked.ranks(), [1, 2])
