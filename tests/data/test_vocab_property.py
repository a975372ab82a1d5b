"""Vocabulary property tests (reference breadth analog:
tests/data/test_vocab.py)."""

from __future__ import annotations

import pickle

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lkpy_tpu.data import Vocabulary

FAST = settings(max_examples=40, deadline=None)

id_lists = st.lists(st.integers(-(10**6), 10**6), min_size=0, max_size=200, unique=True)
# NUL bytes are excluded: numpy's fixed-width str storage truncates at NUL
# (known deviation from the reference's Arrow-backed strings)
str_lists = st.lists(
    st.text(st.characters(min_codepoint=1), min_size=1, max_size=8),
    min_size=0,
    max_size=50,
    unique=True,
)


@FAST
@given(id_lists)
def test_numbers_ids_round_trip(ids):
    v = Vocabulary(np.asarray(ids, np.int64))
    assert len(v) == len(ids)
    nums = v.numbers(np.asarray(ids, np.int64)) if ids else np.array([], np.int32)
    # numbers are a permutation of range(n)
    assert sorted(nums.tolist()) == list(range(len(ids)))
    back = v.terms(nums)
    np.testing.assert_array_equal(np.sort(back), np.sort(np.asarray(ids)))


@FAST
@given(id_lists)
def test_ids_sorted_unique(ids):
    """Vocabulary numbering is sorted-unique over the input ids."""
    v = Vocabulary(np.asarray(ids, np.int64))
    np.testing.assert_array_equal(v.ids, np.sort(np.asarray(ids, np.int64)))


@FAST
@given(str_lists)
def test_string_ids(ids):
    v = Vocabulary(np.asarray(ids, dtype=object) if ids else [])
    for s in ids:
        assert s in v
        assert v.id(v.number(s)) == s


@FAST
@given(id_lists, id_lists)
def test_missing_handling(known, probe):
    v = Vocabulary(np.asarray(known, np.int64))
    p = np.asarray(probe, np.int64)
    nums = v.numbers(p, missing="negative")
    mask = np.isin(p, np.asarray(known, np.int64))
    assert (nums[~mask] == -1).all()
    assert (nums[mask] >= 0).all()
    if len(p) and not mask.all():
        with pytest.raises(KeyError):
            v.numbers(p, missing="error")


@FAST
@given(id_lists, id_lists)
def test_add_terms_monotone(base, extra):
    v = Vocabulary(np.asarray(base, np.int64))
    v2 = v.add_terms(np.asarray(extra, np.int64))
    # old ids keep resolving; new vocabulary covers the union
    assert set(np.asarray(v2.ids).tolist()) == set(base) | set(extra)
    if base:
        nums = v2.numbers(np.asarray(base, np.int64))
        assert (nums >= 0).all()


@FAST
@given(id_lists)
def test_checksum_and_equality(ids):
    a = Vocabulary(np.asarray(ids, np.int64))
    b = Vocabulary(np.asarray(list(reversed(ids)), np.int64))
    # same id set -> same (sorted) vocabulary
    assert a.checksum() == b.checksum()
    assert a == b
    assert hash(a) == hash(b)
    if ids:
        c = Vocabulary(np.asarray(ids[:-1], np.int64))
        assert a != c


@FAST
@given(id_lists)
def test_pickle_round_trip(ids):
    v = Vocabulary(np.asarray(ids, np.int64))
    back = pickle.loads(pickle.dumps(v))
    assert back == v
    np.testing.assert_array_equal(back.ids, v.ids)


def test_large_vocab_uses_native_index():
    """Vocabularies past the native-index threshold must agree with the
    small-path lookups (the hash index is a C++ fast path, not a policy)."""
    rng = np.random.default_rng(42)
    ids = np.unique(rng.integers(0, 10**9, 8192))
    v = Vocabulary(ids)
    probe = np.concatenate([ids[::7], np.asarray([10**9 + 5])])
    nums = v.numbers(probe, missing="negative")
    assert nums[-1] == -1
    np.testing.assert_array_equal(v.terms(nums[:-1]), probe[:-1])
