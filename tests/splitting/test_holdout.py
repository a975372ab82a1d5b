"""Holdout-method unit tests (reference themes: tests/splitting/test_holdout.py)."""

import numpy as np
import pytest

from lkpy_tpu.data import ItemList
from lkpy_tpu.splitting import LastFrac, LastN, SampleFrac, SampleN


def il_with_time(n=10):
    rng = np.random.default_rng(7)
    ts = rng.permutation(n).astype(np.float64) * 100
    return ItemList(item_ids=np.arange(n) + 1, timestamp=ts)


def test_sample_n_size():
    il = il_with_time(10)
    held = SampleN(3, rng=42)(il)
    assert len(held) == 3
    assert np.isin(held.ids(), il.ids()).all()


def test_sample_n_more_than_available():
    il = il_with_time(2)
    held = SampleN(5, rng=42)(il)
    assert len(held) == 2


def test_sample_n_deterministic_with_seed():
    il = il_with_time(10)
    a = SampleN(4, rng=123)(il)
    b = SampleN(4, rng=123)(il)
    np.testing.assert_array_equal(np.sort(a.ids()), np.sort(b.ids()))


def test_sample_frac():
    il = il_with_time(10)
    held = SampleFrac(0.3, rng=42)(il)
    assert len(held) == 3


def test_last_n_takes_latest():
    il = il_with_time(10)
    held = LastN(3)(il)
    ts = il.field("timestamp")
    expect = il.ids()[np.argsort(ts)][-3:]
    np.testing.assert_array_equal(np.sort(held.ids()), np.sort(expect))


def test_last_frac():
    il = il_with_time(10)
    held = LastFrac(0.2)(il)
    assert len(held) == 2
    ts = il.field("timestamp")
    expect = il.ids()[np.argsort(ts)][-2:]
    np.testing.assert_array_equal(np.sort(held.ids()), np.sort(expect))


def test_last_n_requires_timestamp():
    il = ItemList(item_ids=[1, 2, 3])
    with pytest.raises((ValueError, KeyError, TypeError)):
        LastN(2)(il)


def test_crossfold_users_disjoint_and_covering():
    import pandas as pd

    from lkpy_tpu.data import from_interactions_df
    from lkpy_tpu.splitting import crossfold_users

    rng = np.random.default_rng(3)
    n = 600
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 30, n),
            "item_id": rng.integers(0, 100, n),
            "rating": np.ones(n),
        }
    ).drop_duplicates(["user_id", "item_id"])
    ds = from_interactions_df(df)
    folds = list(crossfold_users(ds, 3, SampleN(2, rng=42), rng=42))
    assert len(folds) == 3
    test_users = [set(k.user_id for k in f.test.keys()) for f in folds]
    # disjoint test-user sets covering all users
    for i in range(3):
        for j in range(i + 1, 3):
            assert not (test_users[i] & test_users[j])
    assert set().union(*test_users) == set(np.unique(df["user_id"]))


def test_crossfold_records_partitions():
    import pandas as pd

    from lkpy_tpu.data import from_interactions_df
    from lkpy_tpu.splitting import crossfold_records

    rng = np.random.default_rng(5)
    n = 500
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 20, n),
            "item_id": rng.integers(0, 80, n),
            "rating": np.ones(n),
        }
    ).drop_duplicates(["user_id", "item_id"])
    ds = from_interactions_df(df)
    folds = list(crossfold_records(ds, 4, rng=42))
    assert len(folds) == 4
    total = sum(f.test_size for f in folds)
    assert total == ds.interaction_count
    for f in folds:
        assert f.train.interaction_count + f.test_size == ds.interaction_count
