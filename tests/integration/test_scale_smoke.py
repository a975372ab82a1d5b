"""Large-scale smoke test (reference: tests/movielens/test_ml20m.py:35-46 —
PopScorer batch recommend over ML-20M completes).

ML-20M itself is not shipped; the smoke runs on a synthetic dataset with
MovieLens-like marginals.  Default scale keeps CI fast (~2M interactions);
set ``LK_SCALE_FULL=1`` for the full ML-20M-scale run (the TPU bench also
exercises that scale every round via bench.py).
"""

import os

import numpy as np
import pytest

from lkpy_tpu import batch, topn_pipeline
from lkpy_tpu.data import from_interactions_df
from lkpy_tpu.training import TrainingOptions

FULL = os.environ.get("LK_SCALE_FULL") == "1"
N_USERS = 138_000 if FULL else 30_000
N_ITEMS = 27_000 if FULL else 27_000
NNZ = 20_000_000 if FULL else 2_000_000


@pytest.fixture(scope="module")
def big_ds():
    import pandas as pd

    rng = np.random.default_rng(42)
    item_w = 1.0 / np.arange(1, N_ITEMS + 1) ** 0.8
    cdf = np.cumsum(item_w / item_w.sum())
    users = rng.integers(0, N_USERS, size=NNZ)
    items = np.searchsorted(cdf, rng.random(NNZ))
    df = pd.DataFrame(
        {"user_id": users, "item_id": items, "rating": rng.integers(1, 6, NNZ).astype(np.float32)}
    ).drop_duplicates(["user_id", "item_id"])
    return from_interactions_df(df)


@pytest.mark.slow
@pytest.mark.parametrize("n_jobs", [1, 2])
def test_pop_scale_smoke(big_ds, n_jobs):
    """PopScorer train + batch recommend completes at scale (reference
    ml20m smoke shape, n_jobs in {1,2})."""
    from lkpy_tpu.models.basic import PopScorer

    pipe = topn_pipeline(PopScorer(), n=10)
    pipe.train(big_ds, TrainingOptions(rng=42))
    users = big_ds.users.ids[:1000]
    recs = batch.recommend(pipe, users, n=10, n_jobs=n_jobs)
    assert len(recs) == len(users)
    assert sum(1 for _k, il in recs.items() if len(il) == 10) >= len(users) * 0.95


@pytest.mark.slow
def test_mf_device_batch_scale_smoke(big_ds):
    """Flagship path at scale: implicit-ALS train + device batch recommend
    for 10k users completes and excludes history."""
    from lkpy_tpu.models.als import ImplicitMFScorer

    scorer = ImplicitMFScorer(ImplicitMFScorer.validate_config({"features": 16, "epochs": 2}))
    pipe = topn_pipeline(scorer, n=10)
    pipe.train(big_ds, TrainingOptions(rng=42))
    users = big_ds.users.ids[:10_000]
    recs = batch.recommend(pipe, users, n=10)
    assert len(recs) == len(users)
    # spot-check history exclusion
    mat = big_ds.interaction_matrix()
    for uid in users[:20]:
        row = big_ds.user_row(uid)
        il = recs.lookup(uid)
        assert il is not None
        assert not set(il.ids()).intersection(row.ids())
