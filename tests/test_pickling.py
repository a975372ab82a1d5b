"""
Pickle round-trips for datasets and TRAINED pipelines.

Mirrors the reference's pickling coverage (reference:
tests/data/test_pickle.py and ``verify_models_equivalent`` in
src/lenskit/testing/_components.py): a pickled trained pipeline must
produce identical recommendations — this is the CLI ``train`` command's
persistence mechanism.
"""

import pickle

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu import operations, topn_pipeline
from lkpy_tpu.data import ItemList, from_interactions_df


@pytest.fixture(scope="module")
def ds():
    rng = np.random.default_rng(17)
    n = 4000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 200, n),
            "item_id": rng.integers(1000, 1400, n),
            "rating": rng.integers(1, 6, n).astype(np.float32),
        }
    ).drop_duplicates(["user_id", "item_id"])
    return from_interactions_df(df)


def test_dataset_pickle_round_trip(ds):
    ds.interaction_matrix().csr(None)  # materialize caches too
    back = pickle.loads(pickle.dumps(ds))
    assert back.user_count == ds.user_count
    assert back.item_count == ds.item_count
    assert np.array_equal(back.users.ids, ds.users.ids)
    m1 = back.interaction_matrix().csr(None)
    m0 = ds.interaction_matrix().csr(None)
    assert np.array_equal(m1.rowptr, m0.rowptr)
    assert np.array_equal(m1.colind, m0.colind)


def _same_recs(pipe_a, pipe_b, ds, n=8):
    for uid in list(ds.users.ids[:5]):
        ra = operations.recommend(pipe_a, query=uid, n=n)
        rb = operations.recommend(pipe_b, query=uid, n=n)
        assert list(ra.ids()) == list(rb.ids())
        np.testing.assert_allclose(ra.scores(), rb.scores(), rtol=1e-6)


def test_trained_als_pipeline_pickles(ds):
    from lkpy_tpu.models.als import ImplicitMFScorer

    pipe = topn_pipeline(ImplicitMFScorer(features=16, epochs=3))
    pipe.train(ds)
    back = pickle.loads(pickle.dumps(pipe))
    _same_recs(pipe, back, ds)


def test_trained_flexmf_pipeline_pickles(ds):
    from lkpy_tpu.models.flexmf import FlexMFImplicitScorer

    pipe = topn_pipeline(FlexMFImplicitScorer(embedding_size=16, epochs=2, loss="pairwise"))
    pipe.train(ds)
    back = pickle.loads(pickle.dumps(pipe))
    _same_recs(pipe, back, ds)


def test_trained_knn_pipeline_pickles(ds):
    from lkpy_tpu.models.knn import ItemKNNScorer

    pipe = topn_pipeline(ItemKNNScorer(feedback="implicit", max_nbrs=10))
    pipe.train(ds)
    back = pickle.loads(pickle.dumps(pipe))
    _same_recs(pipe, back, ds)


def test_pickled_pipeline_predicts(ds):
    from lkpy_tpu.models.bias import BiasScorer

    pipe = topn_pipeline(BiasScorer(damping=5.0), predicts_ratings=True)
    pipe.train(ds)
    back = pickle.loads(pickle.dumps(pipe))
    uid = int(ds.users.ids[0])
    items = ItemList(item_ids=np.asarray(ds.items.ids[:5]))
    pa = operations.predict(pipe, query=uid, items=items)
    pb = operations.predict(back, query=uid, items=items)
    np.testing.assert_allclose(pa.scores(), pb.scores(), rtol=1e-6)
