"""
Basic bookkeeping metrics (reference: tests/eval/test_counts.py,
src/lenskit/metrics/basic.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import ItemList, ItemListCollection
from lkpy_tpu.metrics import ListLength, RunAnalysis, TestItemCount, UniqueItemCount


def _ilc(lists: dict[int, list[int]]) -> ItemListCollection:
    ilc = ItemListCollection(["user_id"])
    for uid, items in lists.items():
        ilc.add(ItemList(item_ids=np.asarray(items, dtype=np.int64), ordered=True), uid)
    return ilc


def test_list_length_per_list():
    m = ListLength()
    assert m.label == "N"
    assert m.measure_list(ItemList(item_ids=[1, 2, 3]), ItemList(item_ids=[9])) == 3.0
    assert m.measure_list(ItemList(item_ids=[]), ItemList(item_ids=[9])) == 0.0


def test_test_item_count_per_list():
    m = TestItemCount()
    assert m.measure_list(ItemList(item_ids=[1]), ItemList(item_ids=[7, 8, 9])) == 3.0


def test_unique_item_count_run():
    outs = _ilc({1: [1, 2, 3], 2: [2, 3, 4], 3: [4, 5]})
    m = UniqueItemCount()
    assert m.measure_run(outs, outs) == 5.0


def test_unique_item_count_string_ids():
    ilc = ItemListCollection(["user_id"])
    ilc.add(ItemList(item_ids=["a", "b"]), "u1")
    ilc.add(ItemList(item_ids=["b", "c"]), "u2")
    assert UniqueItemCount().measure_run(ilc, ilc) == 3.0


def test_run_analysis_integration():
    outs = _ilc({1: [1, 2, 3], 2: [4, 5], 3: [6]})
    test = _ilc({1: [2, 9], 2: [5], 3: [7, 8, 9]})
    ra = RunAnalysis()
    ra.add_metric(ListLength())
    ra.add_metric(TestItemCount())
    ra.add_metric(UniqueItemCount())
    res = ra.measure(outs, test)
    lst = res.list_metrics()
    assert np.array_equal(np.sort(lst["N"].to_numpy()), [1.0, 2.0, 3.0])
    assert np.array_equal(np.sort(lst["TestItemCount"].to_numpy()), [1.0, 2.0, 3.0])
    summary = res.list_summary()
    assert summary.loc["N", "mean"] == pytest.approx(2.0)
    # global metric lands in the summary with the run-level value
    assert summary.loc["UniqueItemCount", "mean"] == pytest.approx(6.0)


def test_run_analysis_measures_output_lists_only():
    # measurement iterates OUTPUT lists (reference: _collect.py — a test
    # user with no recommendations contributes no row); an output list with
    # no test data is measured against an empty test list
    outs = _ilc({1: [1, 2], 5: [9]})
    test = _ilc({1: [2], 2: [3]})
    ra = RunAnalysis()
    ra.add_metric(ListLength())
    ra.add_metric(TestItemCount())
    res = ra.measure(outs, test)
    lst = res.list_metrics()
    assert len(lst) == 2
    assert np.array_equal(np.sort(lst["N"].to_numpy()), [1.0, 2.0])
    # user 5 measured against empty test
    assert np.array_equal(np.sort(lst["TestItemCount"].to_numpy()), [0.0, 1.0])


def test_measure_list_convenience():
    from lkpy_tpu.metrics import NDCG, Precision, measure_list

    out = ItemList(item_ids=[1, 2, 3], ordered=True)
    test = ItemList(item_ids=[2])
    assert measure_list(NDCG, out, test) == pytest.approx(1.0)
    assert measure_list(Precision(2), out, test) == pytest.approx(0.5)
    # plain function metrics work too
    assert measure_list(lambda o, t: float(len(o) + len(t)), out, test) == 4.0
    with pytest.raises(TypeError):
        measure_list(object(), out, test)


def test_call_metric_deprecated_alias():
    from lkpy_tpu.metrics import NDCG, call_metric

    out = ItemList(item_ids=[1, 2], ordered=True)
    with pytest.warns(DeprecationWarning):
        v = call_metric(NDCG, out, ItemList(item_ids=[1]))
    assert 0.0 <= v <= 1.0


def test_simple_test_pair():
    from lkpy_tpu.data import from_interactions_df
    from lkpy_tpu.splitting import simple_test_pair

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 30, 800),
            "item_id": rng.integers(0, 50, 800),
            "rating": 1.0,
        }
    ).drop_duplicates(["user_id", "item_id"])
    split = simple_test_pair(from_interactions_df(df), n_users=12, n_rates=3, rng=1)
    assert len(split.test) == 12
    assert all(len(il) == 3 for _k, il in split.test)
    assert split.train.interaction_count == len(df) - 36


def test_array_dcg_graded_matches_manual():
    from lkpy_tpu.metrics.ranking import array_dcg

    scores = np.array([3.0, 0.0, 2.0, 1.0])
    # lenskit discount convention: 1/max(log2(rank), 1) — ranks 1-2 undiscounted
    w = 1.0 / np.maximum(np.log2(np.arange(1, 5)), 1.0)
    assert array_dcg(scores) == pytest.approx(float(np.dot(scores, w)))
    # binary: positive scores count 1
    assert array_dcg(scores, graded=False) == pytest.approx(float(w[0] + w[2] + w[3]))
    assert np.isnan(array_dcg(np.array([])))
    # negative and NaN gains are clipped / zeroed
    assert array_dcg(np.array([-1.0, np.nan, 2.0])) == pytest.approx(2.0 * w[2])


def test_fixed_dcg_is_ideal_prefix():
    from lkpy_tpu.metrics.ranking import array_dcg, fixed_dcg

    assert fixed_dcg(4) == pytest.approx(array_dcg(np.ones(4)))
    assert fixed_dcg(1) == pytest.approx(1.0)
