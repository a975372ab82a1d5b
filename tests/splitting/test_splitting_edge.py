"""
Splitting invariants and edge cases (VERDICT r2 #9; reference analog:
tests/splitting/ in the reference suite).
"""

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
    rng = np.random.default_rng(77)
    n = 4000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 100, n),
            "item_id": rng.integers(0, 200, n),
            "rating": rng.integers(1, 6, n).astype(np.float32),
            "timestamp": rng.integers(1_000, 100_000, n),
        }
    ).drop_duplicates(["user_id", "item_id"])
    return from_interactions_df(df)


def _no_overlap(split):
    """Train interactions and test pairs must be disjoint."""
    train = split.train.interaction_matrix()
    train_pairs = set()
    csr = train.csr(None)
    for u in range(csr.nrows):
        uid = split.train.users.ids[u]
        for c in csr.row_cols(u):
            train_pairs.add((uid, train.col_vocabulary.ids[c]))
    for key, il in split.test.items():
        for iid in il.ids():
            assert (key[0], iid) not in train_pairs, f"leaked {(key[0], iid)}"


def test_sample_users_disjoint_and_counts(ds):
    split = sample_users(ds, 30, SampleN(3, rng=42), rng=42)
    assert len(split.test) == 30
    for _key, il in split.test.items():
        assert len(il) == 3
    _no_overlap(split)
    assert split.test_size + split.train.interaction_count == ds.interaction_count


def test_crossfold_users_partitions(ds):
    folds = list(crossfold_users(ds, 5, SampleFrac(0.2, rng=42), rng=42))
    assert len(folds) == 5
    seen = set()
    for f in folds:
        users = {k[0] for k in f.test.keys()}
        assert not (users & seen), "user in two folds"
        seen |= users
    assert len(seen) == ds.user_count


def test_crossfold_records_partitions(ds):
    folds = list(crossfold_records(ds, 4, rng=42))
    assert len(folds) == 4
    total = sum(f.test_size for f in folds)
    assert total == ds.interaction_count
    for f in folds:
        _no_overlap(f)


def test_sample_records_size(ds):
    split = sample_records(ds, 500, rng=42)
    assert split.test_size == 500
    _no_overlap(split)


def test_last_n_holdout_takes_newest(ds):
    split = sample_users(ds, 20, LastN(2), rng=42)
    mat = ds.interaction_matrix()
    csr = mat.csr("timestamp")
    for key, il in split.test.items():
        u = ds.users.number(key[0])
        ts = ds.interaction_matrix().csr(None).fields.get("timestamp")
        # held-out items must be the user's 2 newest interactions
        row = mat.csr(None)
        s, e = int(row.rowptr[u]), int(row.rowptr[u + 1])
        times = row.fields["timestamp"][s:e]
        cols = row.colind[s:e]
        newest = set(mat.col_vocabulary.ids[cols[np.argsort(times)[-2:]]].tolist())
        assert set(il.ids().tolist()) == newest


def test_last_frac_holdout_size(ds):
    split = sample_users(ds, 20, LastFrac(0.5), rng=42)
    row = ds.interaction_matrix().csr(None)
    for key, il in split.test.items():
        u = ds.users.number(key[0])
        n_u = int(row.rowptr[u + 1] - row.rowptr[u])
        # the reference rounds (reference: _holdout.py:150 `round`)
        assert len(il) == round(n_u * 0.5)


def test_global_time_split(ds):
    split = split_global_time(ds, 50_000)
    row = ds.interaction_matrix().csr(None)
    ts = row.fields["timestamp"]
    n_after = int((ts >= 50_000).sum())
    assert split.test_size == n_after
    # every train interaction is strictly before the cut
    tr = split.train.interaction_matrix().csr(None)
    assert (tr.fields["timestamp"] < 50_000).all()


def test_global_time_multiple_cuts(ds):
    splits = split_global_time(ds, 30_000, 60_000)
    # a [t, end) window returns a single bounded split per the reference
    if isinstance(splits, list):
        assert len(splits) >= 1
        s = splits[0]
    else:
        s = splits
    tr = s.train.interaction_matrix().csr(None)
    assert (tr.fields["timestamp"] < 30_000).all()


def test_temporal_fraction(ds):
    split = split_temporal_fraction(ds, 0.25)
    assert split.test_size == pytest.approx(ds.interaction_count * 0.25, rel=0.05)
    _no_overlap(split)


def test_sample_users_more_than_available(ds):
    # requesting more users than exist: every user sampled once
    split = sample_users(ds, 10_000, SampleN(1, rng=0), rng=0)
    assert len(split.test) == ds.user_count


def test_holdout_sample_n_short_rows(ds):
    """SampleN on users with fewer than n interactions holds out all/most."""
    from lkpy_tpu.data import ItemList

    il = ItemList(item_ids=[1, 2], rating=np.array([1.0, 2.0]))
    held = SampleN(5, rng=0)(il)
    assert len(held) <= 2
