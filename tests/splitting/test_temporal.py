"""
Global-time split semantics (reference: tests/splitting/test_temporal.py
over src/lenskit/splitting/_temporal.py:20,124).
"""

from datetime import datetime

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import from_interactions_df
from lkpy_tpu.splitting import split_global_time, split_temporal_fraction


def make_ds(n=600, n_users=25, n_items=40, t0=1000.0, t1=2000.0):
    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n),
            "item_id": rng.integers(100, 100 + n_items, n),
            "rating": rng.integers(1, 6, n).astype(np.float64),
            "timestamp": rng.uniform(t0, t1, n),
        }
    ).drop_duplicates(["user_id", "item_id"])
    return from_interactions_df(df), df.drop_duplicates(["user_id", "item_id"])


def test_single_point_partitions_by_time():
    ds, df = make_ds()
    split = split_global_time(ds, 1500.0)
    train_ts = split.train.interactions().pandas()["timestamp"].to_numpy()
    assert np.all(train_ts < 1500.0)
    n_test = sum(len(il) for _, il in split.test.items())
    assert n_test == int((df["timestamp"] >= 1500.0).sum())
    assert len(train_ts) + n_test == len(df)
    # every test list's timestamps are in the window
    for _, il in split.test.items():
        assert np.all(il.field("timestamp") >= 1500.0)


def test_bounded_window_excludes_after_end():
    ds, df = make_ds()
    split = split_global_time(ds, 1400.0, 1600.0)
    train_ts = split.train.interactions().pandas()["timestamp"].to_numpy()
    assert np.all(train_ts < 1400.0)
    n_test = sum(len(il) for _, il in split.test.items())
    assert n_test == int(((df["timestamp"] >= 1400.0) & (df["timestamp"] < 1600.0)).sum())
    for _, il in split.test.items():
        ts = il.field("timestamp")
        assert np.all((ts >= 1400.0) & (ts < 1600.0))


def test_multiple_points_yield_consecutive_windows():
    ds, df = make_ds()
    splits = split_global_time(ds, [1300.0, 1600.0])
    assert isinstance(splits, list) and len(splits) == 2
    # first split: test window [1300, 1600), train < 1300
    n1 = sum(len(il) for _, il in splits[0].test.items())
    assert n1 == int(((df["timestamp"] >= 1300.0) & (df["timestamp"] < 1600.0)).sum())
    assert np.all(splits[0].train.interactions().pandas()["timestamp"].to_numpy() < 1300.0)
    # second split: test [1600, inf), train < 1600
    n2 = sum(len(il) for _, il in splits[1].test.items())
    assert n2 == int((df["timestamp"] >= 1600.0).sum())
    assert np.all(splits[1].train.interactions().pandas()["timestamp"].to_numpy() < 1600.0)


def test_datetime_points():
    rng = np.random.default_rng(3)
    base = datetime(2024, 1, 1).timestamp()
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 10, 200),
            "item_id": rng.integers(0, 30, 200),
            "timestamp": base + rng.uniform(0, 86400 * 30, 200),
        }
    ).drop_duplicates(["user_id", "item_id"])
    ds = from_interactions_df(df)
    cut = datetime(2024, 1, 15)
    split = split_global_time(ds, cut)
    train_ts = split.train.interactions().pandas()["timestamp"].to_numpy()
    assert np.all(train_ts < cut.timestamp())
    n_test = sum(len(il) for _, il in split.test.items())
    assert n_test == int((df["timestamp"] >= cut.timestamp()).sum())


def test_fraction_holds_out_most_recent():
    ds, df = make_ds()
    split = split_temporal_fraction(ds, 0.2)
    n_test = sum(len(il) for _, il in split.test.items())
    # quantile cut: close to 20% of interactions in test
    assert abs(n_test - 0.2 * len(df)) <= 0.05 * len(df)
    max_train = split.train.interactions().pandas()["timestamp"].max()
    for _, il in split.test.items():
        assert np.all(il.field("timestamp") >= max_train)


def test_no_timestamps_raises():
    df = pd.DataFrame({"user_id": [1, 2], "item_id": [10, 20]})
    ds = from_interactions_df(df)
    with pytest.raises(ValueError, match="timestamp"):
        split_global_time(ds, 100.0)
