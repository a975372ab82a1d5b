"""Parameter-container property tests: NPZ checkpoint round-trips restore
every model family bit-for-bit, and restored scorers score identically
(reference: state/_container.py protocol; als/_common.py:316-356)."""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lkpy_tpu.data import ItemList, from_interactions_df
from lkpy_tpu.state import load_parameters, save_parameters
from lkpy_tpu.training import TrainingOptions

FAST = settings(max_examples=5, deadline=None)


@st.composite
def tiny_ds(draw):
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    nu, ni = 15, 20
    rows = []
    for u in range(nu):
        for i in rng.choice(ni, size=rng.integers(2, 8), replace=False):
            rows.append((u, int(i), float(rng.uniform(1, 5))))
    return from_interactions_df(pd.DataFrame(rows, columns=["user_id", "item_id", "rating"]))


def roundtrip(model, make_fresh):
    """Save params to NPZ, load into a FRESH instance, compare params."""
    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / "params.npz"
        save_parameters(model, path)
        fresh = make_fresh()
        load_parameters(fresh, path)
    p1, p2 = model.get_parameters(), fresh.get_parameters()
    assert set(p1) == set(p2)
    for k in p1:
        np.testing.assert_array_equal(np.asarray(p1[k]), np.asarray(p2[k]), err_msg=k)
    return fresh


def scores_of(model, ds):
    items = ItemList(item_ids=np.asarray(ds.items.ids[:10], np.int64))
    return model(int(ds.users.ids[0]), items).scores()


@FAST
@given(tiny_ds())
def test_implicit_mf_roundtrip(ds):
    from lkpy_tpu.models.als import ImplicitMFScorer

    cfg = {"features": 8, "epochs": 2, "user_embeddings": "prefer"}
    m = ImplicitMFScorer(ImplicitMFScorer.validate_config(cfg))
    m.train(ds, TrainingOptions(rng=42))

    def fresh():
        f = ImplicitMFScorer(ImplicitMFScorer.validate_config(cfg))
        f.users, f.items = ds.users, ds.items
        f._OtOr = m._OtOr
        return f

    f = roundtrip(m, fresh)
    np.testing.assert_allclose(scores_of(f, ds), scores_of(m, ds), rtol=1e-6)


@FAST
@given(tiny_ds())
def test_biased_mf_roundtrip(ds):
    from lkpy_tpu.models.als import BiasedMFScorer

    cfg = {"features": 8, "epochs": 2}
    m = BiasedMFScorer(BiasedMFScorer.validate_config(cfg))
    m.train(ds, TrainingOptions(rng=42))

    def fresh():
        f = BiasedMFScorer(BiasedMFScorer.validate_config(cfg))
        f.users, f.items = ds.users, ds.items
        f.bias = m.bias
        return f

    roundtrip(m, fresh)


@FAST
@given(tiny_ds())
def test_flexmf_roundtrip(ds):
    from lkpy_tpu.models.flexmf import FlexMFImplicitScorer

    cfg = {"embedding_size": 8, "epochs": 1, "batch_size": 32}
    m = FlexMFImplicitScorer(FlexMFImplicitScorer.validate_config(cfg))
    m.train(ds, TrainingOptions(rng=42))

    def fresh():
        f = FlexMFImplicitScorer(FlexMFImplicitScorer.validate_config(cfg))
        f.users, f.items = ds.users, ds.items
        return f

    roundtrip(m, fresh)


@FAST
@given(tiny_ds())
def test_lightgcn_roundtrip(ds):
    from lkpy_tpu.models.lightgcn import LightGCNScorer

    cfg = {"embedding_size": 8, "epochs": 1, "batch_size": 32}
    m = LightGCNScorer(LightGCNScorer.validate_config(cfg))
    m.train(ds, TrainingOptions(rng=42))

    def fresh():
        f = LightGCNScorer(LightGCNScorer.validate_config(cfg))
        f.users, f.items = ds.users, ds.items
        return f

    roundtrip(m, fresh)


def test_retrain_false_skips(tmp_path):
    """TrainingOptions(retrain=False) leaves an already-trained model
    untouched (checkpoint/resume contract, reference training.py:45)."""
    from lkpy_tpu.models.als import ImplicitMFScorer

    rng = np.random.default_rng(1)
    df = pd.DataFrame(
        {"user_id": np.repeat(np.arange(10), 4), "item_id": rng.integers(0, 12, 40)}
    ).drop_duplicates()
    ds = from_interactions_df(df)
    m = ImplicitMFScorer(ImplicitMFScorer.validate_config({"features": 4, "epochs": 1}))
    m.train(ds, TrainingOptions(rng=42))
    before = np.asarray(m.item_embeddings).copy()
    m.train(ds, TrainingOptions(rng=7, retrain=False))
    np.testing.assert_array_equal(np.asarray(m.item_embeddings), before)
    m.train(ds, TrainingOptions(rng=7, retrain=True))
    assert not np.array_equal(np.asarray(m.item_embeddings), before)
