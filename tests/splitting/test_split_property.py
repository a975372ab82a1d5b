"""Splitting property tests: partitions are exact, leak-free, and respect
their per-user/temporal contracts (reference breadth analog:
tests/splitting/)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from lkpy_tpu.data import from_interactions_df
from lkpy_tpu.splitting import (
    SampleFrac,
    SampleN,
    crossfold_records,
    crossfold_users,
    sample_records,
    sample_users,
    split_global_time,
)

FAST = settings(max_examples=15, deadline=None)


@st.composite
def datasets(draw, with_time=False):
    nu = draw(st.integers(4, 20))
    ni = draw(st.integers(5, 30))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    # >= 3 interactions per user so per-user holdouts are meaningful
    rows = []
    for u in range(nu):
        k = rng.integers(3, min(ni, 8) + 1)
        for i in rng.choice(ni, size=k, replace=False):
            rows.append((u, int(i)))
    df = pd.DataFrame(rows, columns=["user_id", "item_id"])
    if with_time:
        df["timestamp"] = rng.integers(0, 1000, len(df))
    return from_interactions_df(df), df


def pairs_of(ds):
    m = ds.interaction_matrix()
    coo = m.csr(None).to_coo()
    uids = np.asarray(ds.users.ids)[coo.row]
    iids = np.asarray(ds.items.ids)[coo.col]
    return set(zip(uids.tolist(), iids.tolist()))


def held_out_pairs(split):
    out = set()
    for key, il in split.test.items():
        for iid in il.ids():
            out.add((key[0], int(iid)))
    return out


@FAST
@given(datasets(), st.integers(1, 3))
def test_sample_users_partitions(data, n_hold):
    ds, df = data
    n_test_users = max(ds.user_count // 2, 1)
    split = sample_users(ds, n_test_users, SampleN(n_hold, rng=42), rng=42)
    all_pairs = pairs_of(ds)
    train_pairs = pairs_of(split.train)
    tp = held_out_pairs(split)
    # exact partition: no overlap, union = everything
    assert train_pairs | tp == all_pairs
    assert not (train_pairs & tp)
    # the requested number of users, each holding out exactly n (or their max)
    assert len(split.test) == n_test_users
    for key, il in split.test.items():
        assert 1 <= len(il) <= n_hold


@FAST
@given(datasets())
def test_crossfold_users_covers_every_user_once(data):
    ds, df = data
    folds = list(crossfold_users(ds, 3, SampleN(1, rng=42), rng=42))
    assert len(folds) == 3
    seen = []
    for f in folds:
        seen.extend(k[0] for k in f.test.keys())
    assert sorted(seen) == sorted(np.asarray(ds.users.ids).tolist())


@FAST
@given(datasets(), st.floats(0.1, 0.5))
def test_sample_records_partition(data, frac):
    ds, df = data
    size = max(int(len(df) * frac), 1)
    split = sample_records(ds, size, rng=42)
    all_pairs = pairs_of(ds)
    train_pairs = pairs_of(split.train)
    tp = held_out_pairs(split)
    assert train_pairs | tp == all_pairs
    assert not (train_pairs & tp)
    assert sum(len(il) for il in split.test.lists()) == size


@FAST
@given(datasets())
def test_crossfold_records_exact_cover(data):
    ds, df = data
    folds = list(crossfold_records(ds, 4, rng=42))
    all_pairs = pairs_of(ds)
    union = set()
    total = 0
    for f in folds:
        tp = held_out_pairs(f)
        assert not (union & tp)  # folds are disjoint
        union |= tp
        total += len(tp)
    assert union == all_pairs
    assert total == len(all_pairs)


@FAST
@given(datasets(with_time=True), st.integers(100, 900))
def test_global_time_split(data, cut):
    ds, df = data
    split = split_global_time(ds, cut)
    tp = held_out_pairs(split)
    want = set(
        zip(df.loc[df.timestamp >= cut, "user_id"].tolist(), df.loc[df.timestamp >= cut, "item_id"].tolist())
    )
    assert tp == want
    # training data strictly before the cut
    tm = split.train.interaction_matrix().csr("timestamp")
    vals = tm.values if tm.values is not None else tm.fields.get("timestamp")
    if vals is not None and len(vals):
        assert vals.max() < cut
