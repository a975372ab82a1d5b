"""
Vocabulary identity/checksum/term-extension contract
(reference: tests/data/test_vocab.py:286-lines suite over
src/lenskit/data/vocab.py — equality, hashing, stable numbering).
"""

import pickle

import numpy as np
import pytest

from lkpy_tpu.data import Vocabulary


def test_contains_and_iter():
    v = Vocabulary([3, 1, 2], "item")
    assert 2 in v
    assert 9 not in v
    assert list(v) == [1, 2, 3]


def test_eq_and_hash():
    a = Vocabulary([1, 2, 3], "item")
    b = Vocabulary([3, 2, 1], "item")  # same set, sorted identically
    c = Vocabulary([1, 2, 4], "item")
    assert a == b
    assert a != c
    assert hash(a) == hash(b)


def test_checksum_stable_and_discriminating():
    a = Vocabulary([1, 2, 3], "item")
    b = Vocabulary([3, 2, 1], "item")
    c = Vocabulary([1, 2, 4], "item")
    assert a.checksum() == b.checksum()
    assert a.checksum() != c.checksum()
    # checksum survives pickling
    assert pickle.loads(pickle.dumps(a)).checksum() == a.checksum()


def test_number_scalar_and_id():
    v = Vocabulary([10, 20, 30], "item")
    assert v.number(20) == 1
    assert v.id(1) == 20
    with pytest.raises(KeyError):
        v.number(99)
    assert v.number(99, missing="negative") == -1


def test_id_array_subset_and_full():
    v = Vocabulary([10, 20, 30], "item")
    np.testing.assert_array_equal(v.id_array(), [10, 20, 30])
    np.testing.assert_array_equal(v.id_array([2, 0]), [30, 10])


def test_add_terms_sorted_vocab_resorts():
    v = Vocabulary([10, 20, 30], "item")
    v2 = v.add_terms([5, 25, 20])
    # a sorted vocabulary stays sorted: union of IDs, renumbered
    np.testing.assert_array_equal(v2.ids, [5, 10, 20, 25, 30])
    assert len(v2) == 5
    # the original vocabulary is unchanged (vocabularies are immutable)
    assert len(v) == 3
    # adding only known terms returns the same vocabulary
    assert v.add_terms([10, 30]) is v


def test_add_terms_ordered_vocab_appends():
    v = Vocabulary([30, 10, 20], "item", reorder=False)
    before = {i: v.number(i) for i in [30, 10, 20]}
    v2 = v.add_terms([25, 5, 20])
    # an insertion-ordered vocabulary preserves existing numbers and
    # appends the (deduplicated) new terms
    for i, n in before.items():
        assert v2.number(i) == n
    assert v2.number(5) >= 3 and v2.number(25) >= 3
    assert len(v2) == 5


def test_numbers_empty_query():
    v = Vocabulary([1, 2], "item")
    out = v.numbers(np.array([], dtype=np.int64))
    assert len(out) == 0


def test_numbers_matches_scalar_lookup():
    rng = np.random.default_rng(5)
    ids = np.unique(rng.integers(0, 10_000, 500))
    v = Vocabulary(ids, "item")
    q = rng.choice(ids, 200)
    np.testing.assert_array_equal(v.numbers(q), [v.number(int(x)) for x in q])


def test_string_vocab_mixed_query_missing():
    v = Vocabulary(["a", "b", "c"], "item")
    np.testing.assert_array_equal(
        v.numbers(np.array(["c", "z", "a"]), missing="negative"), [2, -1, 0]
    )


def test_size_property():
    v = Vocabulary([1, 2, 3], "item")
    assert v.size == 3 == len(v)
