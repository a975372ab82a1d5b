import numpy as np
import pickle
import pytest

from lkpy_tpu.data import ItemList, Vocabulary


def test_empty():
    il = ItemList()
    assert len(il) == 0
    assert not il


def test_ids_and_scores():
    il = ItemList(item_ids=[3, 1, 2], scores=[0.5, 0.2, 0.9])
    assert len(il) == 3
    assert il.ids().tolist() == [3, 1, 2]
    assert il.scores().tolist() == pytest.approx([0.5, 0.2, 0.9])


def test_numbers_via_vocab():
    v = Vocabulary([1, 2, 3])
    il = ItemList(item_ids=[3, 1], vocabulary=v)
    assert il.numbers().tolist() == [2, 0]


def test_nums_to_ids():
    v = Vocabulary([10, 20, 30])
    il = ItemList(item_nums=[2, 0], vocabulary=v)
    assert il.ids().tolist() == [30, 10]


def test_top_n():
    il = ItemList(item_ids=[1, 2, 3, 4], scores=[0.1, np.nan, 0.9, 0.5])
    top = il.top_n(2)
    assert top.ids().tolist() == [3, 4]
    assert top.ordered
    assert top.ranks().tolist() == [1, 2]
    # NaN dropped entirely
    all_top = il.top_n()
    assert len(all_top) == 3


def test_fields():
    il = ItemList(item_ids=[1, 2], rating=[4.0, 3.0], timestamp=[100, 200])
    assert il.field("rating").tolist() == [4.0, 3.0]
    assert il.field("nope") is None
    assert set(il.field_names) == {"rating", "timestamp"}


def test_isin_remove():
    a = ItemList(item_ids=[1, 2, 3, 4])
    b = ItemList(item_ids=[2, 4])
    assert a.isin(b).tolist() == [False, True, False, True]
    c = a.remove(b)
    assert c.ids().tolist() == [1, 3]


def test_df_roundtrip():
    il = ItemList(item_ids=[1, 2], scores=[0.5, 0.7], rating=[3.0, 4.0])
    df = il.to_df()
    assert "item_id" in df.columns
    il2 = ItemList.from_df(df)
    assert il2.ids().tolist() == [1, 2]
    assert il2.scores().tolist() == pytest.approx([0.5, 0.7])
    assert il2.field("rating").tolist() == [3.0, 4.0]


def test_getitem_slice():
    il = ItemList(item_ids=[1, 2, 3], scores=[0.1, 0.2, 0.3])
    sub = il[1:]
    assert sub.ids().tolist() == [2, 3]
    one = il[np.array([True, False, True])]
    assert one.ids().tolist() == [1, 3]


def test_pickle():
    v = Vocabulary([1, 2, 3])
    il = ItemList(item_ids=[3, 1], vocabulary=v, scores=[1.0, 2.0])
    il2 = pickle.loads(pickle.dumps(il))
    assert il2.ids().tolist() == [3, 1]
    assert il2.scores().tolist() == [1.0, 2.0]


def test_from_vocabulary():
    v = Vocabulary([1, 2, 3])
    il = ItemList.from_vocabulary(v)
    assert len(il) == 3
    assert il.ids().tolist() == [1, 2, 3]
