import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import from_interactions_df
from lkpy_tpu.splitting import (
    LastFrac,
    LastN,
    SampleFrac,
    SampleN,
    crossfold_records,
    crossfold_users,
    sample_records,
    sample_users,
    split_global_time,
    split_temporal_fraction,
)


@pytest.fixture(scope="module")
def ds():
    rng = np.random.default_rng(42)
    n = 2000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 50, n),
            "item_id": rng.integers(100, 300, n),
            "rating": rng.integers(1, 6, n).astype(float),
            "timestamp": rng.integers(0, 10000, n).astype(float),
        }
    ).drop_duplicates(["user_id", "item_id"])
    return from_interactions_df(df)


def test_sample_users(ds):
    split = sample_users(ds, 10, SampleN(3, rng=42), rng=42)
    assert len(split.test) == 10
    for key, il in split.test.items():
        assert len(il) <= 3
    # train + test = original
    assert split.train.interaction_count + split.test_size == ds.interaction_count
    # no overlap
    for key, il in split.test.items():
        urow = split.train.user_row(key.user_id)
        if urow is not None:
            assert not np.isin(il.ids(), urow.ids()).any()
    # train keeps full vocabularies
    assert split.train.item_count == ds.item_count
    assert split.train.user_count == ds.user_count


def test_sample_frac(ds):
    split = sample_users(ds, 10, SampleFrac(0.5, rng=42), rng=42)
    for key, il in split.test.items():
        total = len(ds.user_row(key.user_id))
        assert len(il) == round(total * 0.5)


def test_crossfold_users(ds):
    folds = list(crossfold_users(ds, 5, SampleN(2, rng=42), rng=42))
    assert len(folds) == 5
    all_users = set()
    for f in folds:
        users = {k.user_id for k in f.test.keys()}
        assert not (users & all_users)
        all_users |= users
    assert len(all_users) == ds.user_count


def test_last_n(ds):
    split = sample_users(ds, 5, LastN(2), rng=42)
    for key, il in split.test.items():
        train_row = split.train.user_row(key.user_id)
        if train_row is not None and len(train_row) and il.field("timestamp") is not None:
            assert il.field("timestamp").min() >= train_row.field("timestamp").max()


def test_sample_records(ds):
    split = sample_records(ds, 200, rng=42)
    assert split.test_size == 200
    assert split.train.interaction_count == ds.interaction_count - 200


def test_crossfold_records(ds):
    folds = list(crossfold_records(ds, 4, rng=42))
    assert sum(f.test_size for f in folds) == ds.interaction_count


def test_global_time(ds):
    split = split_global_time(ds, 5000)
    test_ts = split.test.to_df()["timestamp"].to_numpy()
    assert (test_ts >= 5000).all()
    train_ts = split.train.interactions().pandas()["timestamp"].to_numpy()
    assert (train_ts < 5000).all()


def test_temporal_fraction(ds):
    split = split_temporal_fraction(ds, 0.2)
    assert split.test_size == pytest.approx(ds.interaction_count * 0.2, rel=0.05)
