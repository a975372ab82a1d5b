"""
Lazy dataset construction (reference: tests/data/test_dataset_lazy.py —
``Dataset(thunk)`` defers loading until first access).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import Dataset, from_interactions_df


def _make_df():
    rng = np.random.default_rng(0)
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 20, 300),
            "item_id": rng.integers(0, 30, 300),
            "rating": rng.integers(1, 6, 300).astype(float),
        }
    ).drop_duplicates(["user_id", "item_id"])


def test_lazy_defers_until_first_access():
    calls = []

    def loader():
        calls.append(1)
        return from_interactions_df(_make_df())

    ds = Dataset(loader)
    assert calls == []
    assert ds.item_count == 30
    assert calls == [1]
    # subsequent accesses do not reload
    assert ds.user_count == 20
    assert len(ds.item_stats()) == 30
    assert calls == [1]


def test_lazy_matches_eager():
    eager = from_interactions_df(_make_df())
    lazy = Dataset(lambda: from_interactions_df(_make_df()))
    assert np.array_equal(np.asarray(lazy.items.ids), np.asarray(eager.items.ids))
    assert lazy.interaction_count == eager.interaction_count
    le = lazy.item_stats()["count"].sort_index()
    ee = eager.item_stats()["count"].sort_index()
    assert np.array_equal(le.to_numpy(), ee.to_numpy())
    row_l = lazy.user_row(3)
    row_e = eager.user_row(3)
    assert list(row_l.ids()) == list(row_e.ids())


def test_lazy_bad_thunk_raises():
    ds = Dataset(lambda: "not a dataset")
    with pytest.raises(TypeError, match="expected Dataset"):
        ds.item_count


def test_lazy_survives_ipython_repr_probes():
    """Attribute probes outside the data surface (IPython display paths,
    hasattr duck-typing) must NOT trigger the load (round-5 review)."""
    calls = []

    def loader():
        calls.append(1)
        return from_interactions_df(_make_df())

    ds = Dataset(loader)
    assert not hasattr(ds, "_ipython_canary_method_should_not_exist_")
    assert not hasattr(ds, "_repr_html_")
    assert not hasattr(ds, "nonexistent_attr")
    assert calls == []
    assert ds.item_count == 30
    assert calls == [1]


def test_lazy_materialization_thread_safe():
    import threading
    import time

    calls = []

    def loader():
        calls.append(1)
        time.sleep(0.05)
        return from_interactions_df(_make_df())

    ds = Dataset(loader)
    counts = []
    threads = [threading.Thread(target=lambda: counts.append(ds.item_count)) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert counts == [30, 30, 30, 30]
    assert calls == [1]  # the thunk ran exactly once


def test_lazy_pickles_by_materializing():
    import pickle

    ds = Dataset(lambda: from_interactions_df(_make_df()))
    back = pickle.loads(pickle.dumps(ds))
    assert back.item_count == 30


def test_eager_constructor_rejects_missing_args():
    with pytest.raises(TypeError, match="loader thunk"):
        Dataset("not-a-thunk")
