import numpy as np
import pytest

from lkpy_tpu import batch, topn_pipeline
from lkpy_tpu.data import ItemList, ItemListCollection
from lkpy_tpu.models.bias import BiasScorer
from lkpy_tpu.metrics import quick_measure_model


@pytest.fixture(scope="module")
def bias_pipe(ml_ds):
    pipe = topn_pipeline(BiasScorer(damping=5.0), predicts_ratings=True, n=10)
    pipe.train(ml_ds)
    return pipe


def test_batch_recommend(bias_pipe, ml_ds):
    users = ml_ds.users.ids[:20]
    recs = batch.recommend(bias_pipe, users, n=10, n_jobs=1)
    assert len(recs) == 20
    for key, il in recs.items():
        assert len(il) == 10
        assert il.ordered
        # no training items in recs
        hist = ml_ds.user_row(key.user_id)
        assert not np.isin(il.ids(), hist.ids()).any()


def test_batch_predict(bias_pipe, ml_ds):
    pairs = ItemListCollection.from_dict(
        {
            1: ItemList(item_ids=[31, 1029]),
            2: ItemList(item_ids=[10]),
        }
    )
    preds = batch.predict(bias_pipe, pairs, n_jobs=1)
    assert len(preds) == 2
    il = preds.lookup(1)
    assert il.scores() is not None
    assert np.isfinite(il.scores()).all()


def test_batch_threads(bias_pipe, ml_ds):
    users = ml_ds.users.ids[:30]
    recs1 = batch.recommend(bias_pipe, users, n=5, n_jobs=1)
    recs2 = batch.recommend(bias_pipe, users, n=5, n_jobs=4)
    for key, il in recs1.items():
        il2 = recs2.lookup_projected(key)
        assert il2.ids().tolist() == il.ids().tolist()


@pytest.mark.eval
def test_bias_accuracy_gate(ml_ds):
    """Accuracy gate in the reference's style: Bias RMSE on sampled holdout
    (reference gates BiasedMF RMSE 0.89-0.99 on ML-100K; bias-only is close)."""
    res = quick_measure_model(BiasScorer(damping=5.0), ml_ds, predicts_ratings=True, rng=42)
    summary = res.list_summary()
    rmse = summary.loc["RMSE", "mean"]
    assert 0.8 < rmse < 1.05


def test_threaded_profile_csv(bias_pipe, ml_ds, tmp_path):
    """Concurrent profiled runs write one well-formed CSV row per query
    (PipelineProfiler.record is locked; see batch/runner.py thread contract)."""
    from lkpy_tpu.batch.runner import BatchPipelineRunner
    from lkpy_tpu.pipeline.profiling import PipelineProfiler, summarize_profile

    users = ml_ds.users.ids[:24]
    prof_file = tmp_path / "prof.csv"
    runner = BatchPipelineRunner(n_jobs=4, progress=False)
    runner.recommend(n=5)
    with PipelineProfiler(bias_pipe, prof_file) as prof:
        runner.run(bias_pipe, users, profile=prof)
    summary = summarize_profile(prof_file)
    assert (summary["runs"] == 24).all()
    assert (summary["mean_ms"] > 0).all()
