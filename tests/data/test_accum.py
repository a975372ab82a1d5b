"""
Value accumulators (reference: tests/data/test_value_accumulator.py,
src/lenskit/data/accum/).
"""

from __future__ import annotations

import numpy as np
import pytest

from lkpy_tpu.data.accum import ObjectListAccumulator, ValueStatAccumulator


def test_object_list_keeps_order():
    acc = ObjectListAccumulator()
    for x in ("a", "b", "a", 3):
        acc.add(x)
    assert len(acc) == 4
    assert acc.accumulate() == ["a", "b", "a", 3]


def test_value_stats_match_numpy():
    rng = np.random.default_rng(7)
    vals = rng.normal(2.0, 1.5, 100)
    acc = ValueStatAccumulator()
    for v in vals:
        acc.add(float(v))
    st = acc.accumulate()
    assert st["count"] == 100
    assert st["mean"] == pytest.approx(vals.mean())
    assert st["median"] == pytest.approx(np.median(vals))
    assert st["std"] == pytest.approx(vals.std(ddof=1))
    assert st["min"] == pytest.approx(vals.min())
    assert st["max"] == pytest.approx(vals.max())


def test_value_stats_imputes_default_for_missing():
    acc = ValueStatAccumulator(default=0.0)
    acc.add(2.0)
    acc.add(None)
    acc.add(float("nan"))
    st = acc.accumulate()
    assert st["count"] == 3
    assert st["mean"] == pytest.approx(2.0 / 3)


def test_value_stats_default_none_skips():
    acc = ValueStatAccumulator(default=None)
    acc.add(2.0)
    acc.add(None)
    acc.add(float("nan"))
    st = acc.accumulate()
    assert st["count"] == 1
    assert st["mean"] == pytest.approx(2.0)


def test_value_stats_empty_and_singleton():
    empty = ValueStatAccumulator().accumulate()
    assert empty["count"] == 0
    assert np.isnan(empty["mean"])
    one = ValueStatAccumulator()
    one.add(5.0)
    st = one.accumulate()
    assert st["count"] == 1
    assert st["std"] == 0.0
    assert st["min"] == st["max"] == 5.0
