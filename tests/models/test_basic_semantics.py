"""
Semantic tests for the basic/utility components (VERDICT r2 #9;
reference analog: tests/basic/ in the reference suite) — behavior, not just
the config/train grid in test_scorer_grid.py.
"""

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import ItemList, RecQuery, from_interactions_df
from lkpy_tpu.models.basic import (
    FallbackScorer,
    KnownRatingScorer,
    PopScorer,
    RandomSelector,
    SoftmaxRanker,
    TimeBoundedPopScore,
    TopNRanker,
    TrainingItemsCandidateSelector,
    UserTrainingHistoryLookup,
)
from lkpy_tpu.training import TrainingOptions


@pytest.fixture(scope="module")
def ds():
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3, 3, 3, 3],
            "item_id": [10, 11, 12, 10, 11, 10, 11, 12, 13],
            "rating": [4.0, 3.0, 5.0, 2.0, 4.0, 5.0, 3.0, 4.0, 1.0],
            "timestamp": [100, 200, 300, 100, 900, 100, 200, 800, 900],
        }
    )
    return from_interactions_df(df)


def test_pop_scorer_rank_quantile(ds):
    pop = PopScorer()
    pop.train(ds, TrainingOptions())
    il = pop(ItemList(item_ids=[10, 13, 999]))
    s = il.scores()
    # item 10 rated 3x (most popular), 13 once; unknown item scores NaN
    assert s[0] > s[1]
    assert np.isnan(s[2])


def test_pop_scorer_count_mode(ds):
    pop = PopScorer(PopScorer.validate_config({"score": "count"}))
    pop.train(ds, TrainingOptions())
    il = pop(ItemList(item_ids=[10, 13]))
    np.testing.assert_allclose(il.scores(), [3.0, 1.0])


def test_time_bounded_pop(ds):
    # cutoff at 500: only interactions with ts >= 500 count
    tb = TimeBoundedPopScore(TimeBoundedPopScore.validate_config({"cutoff": 500, "score": "count"}))
    tb.train(ds, TrainingOptions())
    il = tb(ItemList(item_ids=[10, 11, 12, 13]))
    s = il.scores()
    # after 500: user2-item11 (900), user3-item12 (800), user3-item13 (900)
    np.testing.assert_allclose(s, [0.0, 1.0, 1.0, 1.0])


def test_topn_ranker_orders_and_truncates():
    r = TopNRanker(TopNRanker.validate_config({"n": 2}))
    il = ItemList(item_ids=[1, 2, 3], scores=[1.0, 3.0, 2.0])
    out = r(il)
    assert list(out.ids()) == [2, 3]
    assert out.ordered
    np.testing.assert_array_equal(out.ranks(), [1, 2])


def test_random_selector_deterministic_per_query():
    r = RandomSelector(RandomSelector.validate_config({"rng": 42}))
    il = ItemList(item_ids=np.arange(100))
    a = r(il, query=RecQuery(user_id=7), n=5)
    b = r(il, query=RecQuery(user_id=7), n=5)
    assert len(a) == 5
    # derivable per-query seeds: same query -> same sample (SPEC-7 style)
    assert list(a.ids()) == list(b.ids())


def test_softmax_ranker_returns_permutation():
    r = SoftmaxRanker(SoftmaxRanker.validate_config({"rng": 1}))
    il = ItemList(item_ids=[1, 2, 3, 4], scores=[5.0, 1.0, 3.0, 2.0])
    out = r(il, n=4)
    assert sorted(out.ids().tolist()) == [1, 2, 3, 4]
    assert out.ordered


def test_history_lookup_attaches_items(ds):
    lk = UserTrainingHistoryLookup()
    lk.train(ds, TrainingOptions())
    q = lk(1)
    assert isinstance(q, RecQuery)
    assert set(q.user_items.ids().tolist()) == {10, 11, 12}


def test_known_rating_scorer(ds):
    kr = KnownRatingScorer()
    kr.train(ds, TrainingOptions())
    q = RecQuery(user_id=1)
    il = kr(q, ItemList(item_ids=[10, 12, 13]))
    s = il.scores()
    np.testing.assert_allclose(s[:2], [4.0, 5.0])
    assert np.isnan(s[2])  # user 1 never rated 13


def test_candidate_selector_excludes_history(ds):
    sel = TrainingItemsCandidateSelector()
    sel.train(ds, TrainingOptions())
    lk = UserTrainingHistoryLookup()
    lk.train(ds, TrainingOptions())
    out = sel(lk(2))
    # user 2 rated 10, 11 -> candidates are the rest of the catalog
    assert set(out.ids().tolist()) == {12, 13}


def test_fallback_scorer_fills_nans():
    primary = ItemList(item_ids=[1, 2, 3], scores=[1.0, np.nan, 3.0])
    backup = ItemList(item_ids=[1, 2, 3], scores=[9.0, 8.0, 7.0])
    fb = FallbackScorer()
    out = fb(primary, backup)
    np.testing.assert_allclose(out.scores(), [1.0, 8.0, 3.0])
