"""
RunAnalysis / MeasurementCollector behavior (VERDICT r2 #9; reference
analog: tests/eval/test_bulk_metrics.py + test_measurement_collector.py over
metrics/_collect.py:60, bulk.py:118).
"""

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import ItemList, ItemListCollection
from lkpy_tpu.metrics import NDCG, RBP, Hit, ListGini, Precision, RecipRank, RunAnalysis
from lkpy_tpu.data import Vocabulary


def make_run():
    outputs = ItemListCollection(["user_id"])
    test = ItemListCollection(["user_id"])
    outputs.add(ItemList(item_ids=[1, 2, 3], scores=[3.0, 2.0, 1.0], ordered=True), 100)
    test.add(ItemList(item_ids=[1, 9]), 100)
    outputs.add(ItemList(item_ids=[4, 5], scores=[2.0, 1.0], ordered=True), 200)
    test.add(ItemList(item_ids=[7]), 200)  # no hits
    return outputs, test


def test_list_metrics_per_user():
    outputs, test = make_run()
    ra = RunAnalysis(Precision(), RecipRank())
    res = ra.measure(outputs, test)
    lm = res.list_metrics()
    assert len(lm) == 2
    # user 100: 1 hit of 3 recs at rank 1
    row = lm[lm["user_id"] == 100].iloc[0]
    assert row["Precision"] == pytest.approx(1 / 3)
    assert row["RecipRank"] == pytest.approx(1.0)
    # user 200: nothing
    row2 = lm[lm["user_id"] == 200].iloc[0]
    assert row2["Precision"] == pytest.approx(0.0)
    assert row2["RecipRank"] == pytest.approx(0.0)


def test_summary_means():
    outputs, test = make_run()
    ra = RunAnalysis(Precision(), Hit())
    res = ra.measure(outputs, test)
    s = res.list_summary()
    assert s.loc["Precision", "mean"] == pytest.approx((1 / 3 + 0) / 2)
    assert s.loc["Hit", "mean"] == pytest.approx(0.5)


def test_missing_test_list_uses_default():
    outputs, test = make_run()
    outputs.add(ItemList(item_ids=[6], scores=[1.0], ordered=True), 300)  # no test list
    ra = RunAnalysis()
    # NDCG is NaN against an empty test list (the reference measures missing
    # lists against ItemList([]), _collect.py:180), then the default fills it
    ra.add_metric(NDCG(), default=0.0)
    res = ra.measure(outputs, test)
    lm = res.list_metrics()
    assert len(lm) == 3  # the row EXISTS (not skipped)
    assert lm[lm["user_id"] == 300]["NDCG"].iloc[0] == pytest.approx(0.0)
    # without filling, it is NaN
    raw = res.list_metrics(fill_missing=False)
    assert np.isnan(raw[raw["user_id"] == 300]["NDCG"].iloc[0])


def test_custom_labels():
    outputs, test = make_run()
    ra = RunAnalysis()
    ra.add_metric(NDCG(n=2), label="quality")
    res = ra.measure(outputs, test)
    assert "quality" in res.list_metrics().columns


def test_global_metric_gini():
    outputs, test = make_run()
    vocab = Vocabulary([1, 2, 3, 4, 5, 6, 7, 8, 9], "item")
    ra = RunAnalysis(ListGini(items=vocab))
    res = ra.measure(outputs, test)
    g = res.global_metrics()
    assert "ListGini" in g.index
    assert 0.0 <= g["ListGini"] <= 1.0


def test_mixed_list_and_global():
    outputs, test = make_run()
    vocab = Vocabulary(list(range(1, 10)), "item")
    ra = RunAnalysis(Precision(), ListGini(items=vocab), RBP())
    res = ra.measure(outputs, test)
    assert set(res.list_summary().index) >= {"Precision", "RBP"}
    assert "ListGini" in res.global_metrics().index
