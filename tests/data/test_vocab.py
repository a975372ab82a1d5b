import numpy as np
import pickle
import pytest

from lkpy_tpu.data import Vocabulary


def test_empty():
    v = Vocabulary()
    assert len(v) == 0
    assert (v.numbers([1, 2], missing="negative") == -1).all()


def test_basic_lookup():
    v = Vocabulary([5, 3, 9, 1], "item")
    assert len(v) == 4
    # sorted order
    assert v.ids.tolist() == [1, 3, 5, 9]
    assert v.number(3) == 1
    assert v.id(2) == 5
    assert v.numbers([9, 1]).tolist() == [3, 0]
    assert 5 in v
    assert 7 not in v


def test_missing_error():
    v = Vocabulary([1, 2, 3])
    with pytest.raises(KeyError):
        v.numbers([1, 7])
    assert v.numbers([1, 7], missing="negative").tolist() == [0, -1]


def test_string_ids():
    v = Vocabulary(["b", "a", "c"])
    assert v.ids.tolist() == ["a", "b", "c"]
    assert v.number("b") == 1


def test_no_reorder():
    v = Vocabulary([5, 3, 9], reorder=False)
    assert v.ids.tolist() == [5, 3, 9]
    assert v.number(5) == 0
    assert v.number(9) == 2
    assert v.numbers([3, 9, 5]).tolist() == [1, 2, 0]


def test_dedup():
    v = Vocabulary([1, 2, 2, 3, 1])
    assert len(v) == 3


def test_unique_required_unordered():
    with pytest.raises(ValueError):
        Vocabulary([1, 1, 2], reorder=False)


def test_pickle_roundtrip():
    v = Vocabulary([5, 3, 9, 1], "item")
    v2 = pickle.loads(pickle.dumps(v))
    assert v2 == v
    assert v2.numbers([3, 9]).tolist() == v.numbers([3, 9]).tolist()


def test_add_terms():
    v = Vocabulary([1, 3])
    v2 = v.add_terms([2, 3, 5])
    assert len(v2) == 4
    assert v2.number(2) >= 0


def test_large_roundtrip():
    rng = np.random.default_rng(42)
    ids = rng.choice(1_000_000, size=5000, replace=False)
    v = Vocabulary(ids)
    nums = v.numbers(ids)
    back = v.id_array(nums)
    assert (back == ids).all()
