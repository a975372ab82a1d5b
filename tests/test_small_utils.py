"""
Small-utility semantics: accumulators, queries, lazy values, stats,
flatten helpers, rate-limited warnings, batch results.

Mirrors the reference's unit coverage of these corners
(reference: src/lenskit/data/accum/_value.py:27, data/_query.py:34,
lazy.py:21, stats.py, data/_flatten.py:14, logging/_warnings.py,
batch/_results.py).
"""

import warnings

import numpy as np
import pytest

from lkpy_tpu.batch.results import BatchResults
from lkpy_tpu.data import ItemList
from lkpy_tpu.data.accum import ObjectListAccumulator, ValueStatAccumulator
from lkpy_tpu.data.flatten import flatten_dict, unflatten_dict
from lkpy_tpu.data.query import RecQuery
from lkpy_tpu.lazy import LazyValue
from lkpy_tpu.logging.limit import RateLimitedWarnings
from lkpy_tpu.utils.stats import damped_mean, gini


class TestValueStatAccumulator:
    def test_basic_stats(self):
        acc = ValueStatAccumulator()
        for v in [1.0, 2.0, 3.0, 4.0]:
            acc.add(v)
        s = acc.accumulate()
        assert s["mean"] == pytest.approx(2.5)
        assert s["median"] == pytest.approx(2.5)
        assert s["std"] == pytest.approx(np.std([1, 2, 3, 4], ddof=1))
        assert (s["min"], s["max"], s["count"]) == (1.0, 4.0, 4)

    def test_nan_imputed_with_default(self):
        acc = ValueStatAccumulator(default=0.0)
        acc.add(2.0)
        acc.add(float("nan"))
        acc.add(None)
        s = acc.accumulate()
        assert s["count"] == 3
        assert s["mean"] == pytest.approx(2.0 / 3)

    def test_none_default_skips(self):
        acc = ValueStatAccumulator(default=None)
        acc.add(None)
        acc.add(5.0)
        assert acc.accumulate()["count"] == 1

    def test_empty_is_nan(self):
        s = ValueStatAccumulator().accumulate()
        assert np.isnan(s["mean"]) and s["count"] == 0

    def test_single_value_zero_std(self):
        acc = ValueStatAccumulator()
        acc.add(7.0)
        assert acc.accumulate()["std"] == 0.0


def test_object_list_accumulator():
    acc = ObjectListAccumulator()
    acc.add("a")
    acc.add("b")
    assert len(acc) == 2
    assert acc.accumulate() == ["a", "b"]


class TestRecQuery:
    def test_create_from_id(self):
        q = RecQuery.create(42)
        assert q.user_id == 42 and q.query_id == 42
        assert q.user_items is None

    def test_create_from_itemlist(self):
        il = ItemList(item_ids=[1, 2, 3])
        q = RecQuery.create(il)
        assert q.user_id is None
        assert q.user_items is il
        assert q.query_items is il  # rename alias

    def test_create_identity_and_none(self):
        q = RecQuery(user_id=9)
        assert RecQuery.create(q) is q
        assert RecQuery.create(None).user_id is None


def test_lazy_value_memoizes():
    calls = []
    lv = LazyValue(lambda: calls.append(1) or "x")
    assert lv.get() == "x"
    assert lv.get() == "x"
    assert len(calls) == 1


class TestGini:
    def test_equal_distribution_is_zero(self):
        assert gini(np.ones(10)) == pytest.approx(0.0)

    def test_concentrated_approaches_one(self):
        x = np.zeros(1000)
        x[0] = 100.0
        assert gini(x) == pytest.approx(1.0, abs=1e-2)

    def test_known_value(self):
        # hand-computed: [1, 3] -> G = (2+1 - 2*(1+4)/4)/2 = 0.25
        assert gini(np.array([1.0, 3.0])) == pytest.approx(0.25)

    def test_empty_and_zero(self):
        assert gini(np.array([])) == 0.0
        assert gini(np.zeros(5)) == 0.0


def test_damped_mean():
    assert damped_mean(np.array([4.0, 2.0]), 0.0) == pytest.approx(3.0)
    assert damped_mean(np.array([4.0, 2.0]), 2.0) == pytest.approx(1.5)


def test_flatten_round_trip():
    d = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    flat = flatten_dict(d)
    assert flat == {"a.b": 1, "a.c.d": 2, "e": 3}
    assert unflatten_dict(flat) == d


def test_rate_limited_warnings():
    rl = RateLimitedWarnings(window=1000.0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rl.warn("hello")
        rl.warn("hello")  # suppressed inside the window
        rl.warn("other")
    assert [str(x.message) for x in w] == ["hello", "other"]


def test_batch_results():
    br = BatchResults(("user_id",))
    br.add_result("recommendations", (1,), ItemList(item_ids=[5, 6]))
    br.add_result("recommendations", (2,), ItemList(item_ids=[7]))
    br.add_result("predictions", (1,), ItemList(item_ids=[5]))
    assert sorted(br.outputs) == ["predictions", "recommendations"]
    assert br.output("recommendations").total_items() == 3
    assert list(br.output("recommendations").lookup(2).ids()) == [7]
    with pytest.raises(KeyError):
        br.output("nope")


def test_latch_threads():
    """Latch coordinates threads (reference: tests/utils/test_latch.py)."""
    import threading
    import time

    from lkpy_tpu.utils.misc import Latch

    latch = Latch(3)
    results = []

    def worker(i):
        latch.count_down()
        results.append(i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    assert latch.wait(timeout=5.0)
    for t in threads:
        t.join()
    assert sorted(results) == [0, 1, 2]
    # already-open latch returns immediately
    assert latch.wait(timeout=0.01)
    # extra count_down on an open latch is harmless
    latch.count_down()
    assert latch.wait(timeout=0.01)


def test_latch_timeout():
    from lkpy_tpu.utils.misc import Latch

    latch = Latch(1)
    assert not latch.wait(timeout=0.05)
    latch.count_down()
    assert latch.wait(timeout=0.05)
