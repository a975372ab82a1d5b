"""ItemList property tests: invariants over randomly generated lists
(reference breadth analog: tests/data/test_itemlist.py, 48-file suite)."""

from __future__ import annotations

import pickle

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lkpy_tpu.data import ItemList, Vocabulary
from lkpy_tpu.testing.arrays import scored_lists

FAST = settings(max_examples=40, deadline=None)


@FAST
@given(scored_lists())
def test_length_and_ids_consistent(il):
    assert len(il) == len(il.ids())
    s = il.scores()
    if s is not None:
        assert len(s) == len(il)


@FAST
@given(scored_lists(scores="yes"), st.integers(1, 30))
def test_top_n_is_sorted_prefix(il, n):
    top = il.top_n(n)
    assert len(top) == min(n, len(il))
    ts = top.scores()
    # descending scores
    assert np.all(np.diff(ts) <= 1e-6)
    # the top-n scores are the n largest overall
    if len(il):
        want = np.sort(il.scores())[::-1][: len(top)]
        np.testing.assert_array_equal(np.sort(ts)[::-1], want)
    assert top.ordered


@FAST
@given(scored_lists())
def test_copy_constructor_preserves(il):
    dup = ItemList(il)
    np.testing.assert_array_equal(dup.ids(), il.ids())
    s1, s2 = dup.scores(), il.scores()
    assert (s1 is None) == (s2 is None)
    if s1 is not None:
        np.testing.assert_array_equal(s1, s2)
    assert dup.ordered == il.ordered


@FAST
@given(scored_lists(scores="yes"))
def test_copy_with_scores_drop(il):
    dup = ItemList(il, scores="drop")
    assert dup.scores() is None
    np.testing.assert_array_equal(dup.ids(), il.ids())


@FAST
@given(scored_lists())
def test_pickle_round_trip(il):
    back = pickle.loads(pickle.dumps(il))
    np.testing.assert_array_equal(back.ids(), il.ids())
    s1, s2 = back.scores(), il.scores()
    if s1 is not None:
        np.testing.assert_array_equal(s1, s2)


@FAST
@given(scored_lists())
def test_vocabulary_number_resolution(il):
    """numbers(vocabulary=...) resolves through any vocabulary covering the
    ids; unknown ids honor missing='negative'."""
    if len(il) == 0:
        return
    ids = il.ids()
    vocab = Vocabulary(np.concatenate([ids, [10_001, 10_002]]))
    nums = il.numbers(vocabulary=vocab)
    np.testing.assert_array_equal(vocab.terms(nums), ids)
    # a vocabulary missing some ids
    small = Vocabulary(ids[: max(len(ids) // 2, 1)])
    got = il.numbers(vocabulary=small, missing="negative")
    known = np.isin(ids, small.ids)
    assert (got[~known] == -1).all()
    assert (got[known] >= 0).all()


@FAST
@given(scored_lists(scores="yes"))
def test_field_access_and_extra_fields(il):
    il2 = ItemList(il, prediction=np.arange(len(il), dtype=np.float32))
    np.testing.assert_array_equal(il2.field("prediction"), np.arange(len(il)))
    assert il2.field("nope") is None
    # score field is aliased
    np.testing.assert_array_equal(il2.field("score"), il.scores())


@FAST
@given(st.lists(st.integers(1, 100), min_size=0, max_size=30, unique=True))
def test_rank_assignment(ids):
    il = ItemList(item_ids=np.asarray(ids, np.int64), rank=np.arange(1, len(ids) + 1))
    assert il.ordered
    rk = il.ranks()
    np.testing.assert_array_equal(rk, np.arange(1, len(ids) + 1))


@FAST
@given(scored_lists(scores="yes"), st.integers(1, 10))
def test_top_n_ids_match_argsort(il, n):
    top = il.top_n(n)
    scores = il.scores()
    order = np.argsort(-scores, kind="stable")[: len(top)]
    # scores equal (id ties may permute among equal scores)
    np.testing.assert_array_equal(top.scores(), scores[order])
