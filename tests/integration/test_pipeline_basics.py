"""End-to-end integration tests (reference: tests/integration/test_pipeline_basics.py)."""

import numpy as np
import pytest

from lkpy_tpu import batch, predict, recommend, score, topn_pipeline
from lkpy_tpu.data import ItemList
from lkpy_tpu.metrics import NDCG, RMSE, RunAnalysis
from lkpy_tpu.models.als import BiasedMFScorer
from lkpy_tpu.models.bias import BiasScorer
from lkpy_tpu.splitting import SampleFrac, sample_users
from lkpy_tpu.training import TrainingOptions


@pytest.fixture(scope="module")
def split(ml_ds):
    return sample_users(ml_ds, 100, SampleFrac(0.2, rng=42), rng=42)


def test_full_eval_loop(split):
    """Train -> batch recommend -> measure, the full offline loop."""
    pipe = topn_pipeline(BiasedMFScorer(features=16, epochs=3), predicts_ratings=True, n=10)
    pipe.train(split.train, TrainingOptions(rng=42))

    recs = batch.recommend(pipe, split.test, n=10)
    assert len(recs) == len(split.test)

    ra = RunAnalysis(NDCG(10))
    res = ra.measure(recs, split.test)
    ndcg = res.list_summary().loc["NDCG@10", "mean"]
    assert 0 <= ndcg <= 1

    preds = batch.predict(pipe, split.test)
    pa = RunAnalysis(RMSE("ignore", "ignore"))
    pres = pa.measure(preds, split.test)
    assert 0.5 < pres.list_summary().loc["RMSE", "mean"] < 1.5


def test_operations_roundtrip(ml_ds):
    pipe = topn_pipeline(BiasScorer(), predicts_ratings=True, n=5)
    pipe.train(ml_ds)
    r = recommend(pipe, 1, n=5)
    assert len(r) == 5
    s = score(pipe, 1, ItemList(item_ids=[31, 1029]))
    assert np.isfinite(s.scores()).all()
    p = predict(pipe, 1, ItemList(item_ids=[31, 1029]))
    assert np.isfinite(p.scores()).all()


def test_config_retrain_roundtrip(ml_ds):
    """Serialize a trained pipeline's config, rebuild, retrain, same recs."""
    from lkpy_tpu.pipeline import Pipeline

    pipe = topn_pipeline(BiasScorer(damping=5.0), n=10)
    pipe.train(ml_ds, TrainingOptions(rng=42))
    pipe2 = Pipeline.from_config(pipe.get_config())
    pipe2.train(ml_ds, TrainingOptions(rng=42))
    r1 = recommend(pipe, 1, n=10)
    r2 = recommend(pipe2, 1, n=10)
    assert r1.ids().tolist() == r2.ids().tolist()


@pytest.mark.slow
def test_pop_scale_smoke(ml_ds):
    """Scale smoke in the reference's style (tests/movielens/test_ml20m.py:35):
    PopScorer batch recommend for many users, multiple n_jobs."""
    from lkpy_tpu.models.basic import PopScorer

    pipe = topn_pipeline(PopScorer(), n=10)
    pipe.train(ml_ds)
    users = np.tile(ml_ds.users.ids, 3)  # ~2k queries
    for n_jobs in (1, 2):
        recs = batch.recommend(pipe, users, n=10, n_jobs=n_jobs, device=False)
        assert len(recs) == len(users)


@pytest.mark.parametrize("family", ["pop", "bias", "implicit-mf", "item-knn"])
def test_training_items_removed(family, ml_ds):
    """Recommendations never contain the user's training items, for any
    scorer family and both the solo and batch paths (reference:
    tests/integration/test_pipeline_basics.py:72,89,108)."""
    from lkpy_tpu import recommend, topn_pipeline
    from lkpy_tpu.batch import recommend as batch_recommend
    from lkpy_tpu.models.als import ImplicitMFScorer
    from lkpy_tpu.models.basic import PopScorer
    from lkpy_tpu.models.bias import BiasScorer
    from lkpy_tpu.models.knn import ItemKNNScorer
    from lkpy_tpu.training import TrainingOptions

    scorer = {
        "pop": lambda: PopScorer(),
        "bias": lambda: BiasScorer(damping=5.0),
        "implicit-mf": lambda: ImplicitMFScorer(features=8, epochs=2),
        "item-knn": lambda: ItemKNNScorer(max_nbrs=10),
    }[family]()
    pipe = topn_pipeline(scorer, n=20)
    pipe.train(ml_ds, TrainingOptions(rng=42))
    rng = np.random.default_rng(5)
    users = rng.choice(np.asarray(ml_ds.users.ids), 5, replace=False)
    matrix = ml_ds.interaction_matrix()
    for u in users:
        hist = set(matrix.row_items(int(u)).ids().tolist())
        solo = recommend(pipe, int(u), 20)
        assert not (set(solo.ids().tolist()) & hist), family
    batch_out = batch_recommend(pipe, [int(u) for u in users], 20)
    for u in users:
        hist = set(matrix.row_items(int(u)).ids().tolist())
        il = batch_out.lookup(int(u))
        assert not (set(il.ids().tolist()) & hist), family
