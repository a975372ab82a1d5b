"""
ItemList construction-contract and export-format tests
(reference: tests/data/test_itemlist.py:89-155 exercises the constructor
validation, 223-350 the export formats, 943-1000 the concat rules).
"""

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import ItemList, Vocabulary


@pytest.fixture()
def vocab():
    return Vocabulary(np.arange(10, 20), "item")


def test_ids_nums_size_mismatch_raises(vocab):
    with pytest.raises(ValueError, match="mismatched sizes"):
        ItemList(item_ids=[10, 11, 12], item_nums=[0, 1], vocabulary=vocab)


def test_bad_dimension_raises():
    with pytest.raises(TypeError, match="1-D"):
        ItemList(item_ids=np.arange(6).reshape(2, 3))
    with pytest.raises(TypeError, match="1-D"):
        ItemList(item_nums=np.arange(6).reshape(2, 3))


def test_float_nums_raise():
    with pytest.raises(TypeError, match="integers"):
        ItemList(item_nums=np.array([0.5, 1.5]))


def test_field_length_mismatch_raises():
    with pytest.raises(ValueError, match="length"):
        ItemList(item_ids=[1, 2, 3], rating=[4.0, 5.0])


def test_copy_ctor_drop_scores():
    il = ItemList(item_ids=[1, 2, 3], scores=[0.5, 0.2, 0.9])
    bare = ItemList(il, scores="drop")
    assert bare.scores() is None
    # the original is untouched
    np.testing.assert_allclose(il.scores(), [0.5, 0.2, 0.9])


def test_copy_ctor_replace_scores():
    il = ItemList(item_ids=[1, 2, 3], scores=[0.5, 0.2, 0.9])
    il2 = ItemList(il, scores=[1.0, 2.0, 3.0])
    np.testing.assert_allclose(il2.scores(), [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(il2.ids(), il.ids())


def test_numbers_alternate_vocabulary(vocab):
    il = ItemList(item_ids=[10, 12, 14], vocabulary=vocab)
    # remap through a different vocabulary by ID, not by stored number
    alt = Vocabulary(np.arange(12, 22), "item")
    np.testing.assert_array_equal(il.numbers(vocabulary=alt, missing="negative"), [-1, 0, 2])
    # the original vocabulary still gives original numbers
    np.testing.assert_array_equal(il.numbers(), [0, 2, 4])


def test_export_formats():
    il = ItemList(item_ids=[1, 2, 3], scores=[0.5, 0.2, 0.9])
    s_pd = il.scores("pandas")
    assert isinstance(s_pd, pd.Series)
    s_jax = il.scores("jax")
    np.testing.assert_allclose(np.asarray(s_jax), il.scores())
    import torch

    s_t = il.scores("torch")
    assert isinstance(s_t, torch.Tensor)
    np.testing.assert_allclose(s_t.numpy(), il.scores())
    import pyarrow as pa

    assert isinstance(il.scores("arrow"), pa.Array)
    with pytest.raises(ValueError, match="unknown format"):
        il.scores("msgpack")


def test_concat_fills_missing_fields_with_nan():
    a = ItemList(item_ids=[1, 2], scores=[0.1, 0.2])
    b = ItemList(item_ids=[3, 4])
    cat = a.concat(b)
    s = cat.scores()
    np.testing.assert_allclose(s[:2], [0.1, 0.2])
    assert np.isnan(s[2:]).all()


def test_concat_drops_rank():
    a = ItemList(item_ids=[1, 2], scores=[0.9, 0.1]).top_n(2)
    assert a.ranks() is not None
    cat = a.concat(ItemList(item_ids=[3]))
    assert not cat.ordered
    assert cat.ranks() is None


def test_getitem_negative_slice():
    il = ItemList(item_ids=[1, 2, 3, 4, 5], scores=np.arange(5.0))
    tail = il[-2:]
    np.testing.assert_array_equal(tail.ids(), [4, 5])
    np.testing.assert_allclose(tail.scores(), [3.0, 4.0])
    head = il[:-3]
    np.testing.assert_array_equal(head.ids(), [1, 2])


def test_getitem_int_keeps_listness():
    il = ItemList(item_ids=[7, 8, 9])
    one = il[1]
    assert isinstance(one, ItemList)
    assert len(one) == 1
    assert one.ids()[0] == 8


def test_take_preserves_extra_fields():
    il = ItemList(item_ids=[1, 2, 3], rating=np.array([3.0, 4.0, 5.0]))
    sub = il[[2, 0]]
    np.testing.assert_allclose(sub.field("rating"), [5.0, 3.0])


def test_ordered_list_implicit_ranks():
    il = ItemList(item_ids=[5, 6, 7], ordered=True)
    np.testing.assert_array_equal(il.ranks(), [1, 2, 3])
    un = ItemList(item_ids=[5, 6, 7])
    assert un.ranks() is None


def test_from_df_mixed_nan_rank_treated_unranked():
    df = pd.DataFrame({"item_id": [1, 2], "rank": [np.nan, np.nan]})
    il = ItemList.from_df(df)
    assert not il.ordered


def test_from_df_ranked():
    df = pd.DataFrame({"item_id": [4, 5], "rank": [1, 2], "score": [0.9, 0.7]})
    il = ItemList.from_df(df)
    assert il.ordered
    np.testing.assert_array_equal(il.ranks(), [1, 2])
    np.testing.assert_allclose(il.scores(), [0.9, 0.7])


def test_bool_and_repr():
    assert not ItemList()
    il = ItemList(item_ids=[1], ordered=True)
    assert il
    assert "1 items" in repr(il) and "ordered" in repr(il)
