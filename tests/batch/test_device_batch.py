import numpy as np
import pytest

from lkpy_tpu import batch, topn_pipeline
from lkpy_tpu.batch.device import device_recommend, supports_device_batch, try_device_recommend
from lkpy_tpu.models.als import ImplicitMFScorer
from lkpy_tpu.models.knn import ItemKNNScorer
from lkpy_tpu.training import TrainingOptions


@pytest.fixture(scope="module")
def mf_pipe(ml_ds):
    pipe = topn_pipeline(ImplicitMFScorer(features=16, epochs=3), n=10)
    pipe.train(ml_ds, TrainingOptions(rng=42))
    return pipe


def test_supports(mf_pipe):
    scorer = mf_pipe.node("scorer").component
    assert supports_device_batch(scorer)
    assert not supports_device_batch(ItemKNNScorer())


def test_device_matches_per_query(mf_pipe, ml_ds):
    users = ml_ds.users.ids[:30]
    fast = batch.recommend(mf_pipe, users, n=10)  # device path
    slow = batch.recommend(mf_pipe, users, n=10, device=False)
    assert len(fast) == len(slow) == 30
    for key, il in slow.items():
        fil = fast.lookup_projected(key)
        # same item sets in the same order (modulo fp ties)
        overlap = np.isin(fil.ids()[:10], il.ids()[:10]).mean()
        assert overlap >= 0.9, f"user {key}: {fil.ids()} vs {il.ids()}"


def test_device_excludes_history(mf_pipe, ml_ds):
    users = ml_ds.users.ids[:20]
    recs = batch.recommend(mf_pipe, users, n=10)
    for key, il in recs.items():
        hist = ml_ds.user_row(key.user_id)
        assert not np.isin(il.ids(), hist.ids()).any()


def test_device_unknown_user(mf_pipe):
    recs = batch.recommend(mf_pipe, [999999999], n=5)
    il = recs.lookup(999999999)
    assert il is not None and len(il) == 0


def test_nonstandard_pipeline_falls_back(ml_ds):
    pipe = topn_pipeline(ItemKNNScorer(), n=10)
    pipe.train(ml_ds, TrainingOptions(rng=42))
    assert try_device_recommend(pipe, ml_ds.users.ids[:3], 10) is None
    recs = batch.recommend(pipe, ml_ds.users.ids[:3], n=10)
    assert len(recs) == 3


def test_device_mesh_matches_single(mf_pipe, ml_ds):
    """Mesh-sharded device batch must equal the unsharded device batch
    (VERDICT r1 item 8: query fan-out over the data axis)."""
    import jax

    from lkpy_tpu.parallel import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=4, model=2))
    users = ml_ds.users.ids[:50]
    single = batch.recommend(mf_pipe, users, n=10)
    sharded = batch.recommend(mf_pipe, users, n=10, mesh=mesh)
    assert len(single) == len(sharded)
    for (k1, il1), (k2, il2) in zip(single.items(), sharded.items()):
        assert k1 == k2
        np.testing.assert_array_equal(il1.ids(), il2.ids())
        np.testing.assert_allclose(il1.scores(), il2.scores(), rtol=1e-5)


def test_distributed_recommend_single_process(mf_pipe, ml_ds):
    """distributed=True in a single-process run equals the plain device path
    (process split is identity; gather is a passthrough)."""
    from lkpy_tpu.parallel import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=4, model=2))
    users = ml_ds.users.ids[:30]
    plain = batch.recommend(mf_pipe, users, n=10)
    dist = batch.recommend(mf_pipe, users, n=10, mesh=mesh, distributed=True)
    assert dist is not None
    assert len(dist) == len(plain)
    for (k1, il1), (k2, il2) in zip(plain.items(), dist.items()):
        assert k1 == k2
        np.testing.assert_array_equal(il1.ids(), il2.ids())


def test_device_tuple_keyed_users(mf_pipe, ml_ds):
    """Key-tuple query lists (e.g. ``split.test.keys()``) flatten onto the
    device batch path instead of producing rank-3 history arrays."""
    users = ml_ds.users.ids[:12]
    as_keys = [(u,) for u in users]
    fast = batch.recommend(mf_pipe, as_keys, n=5)
    plain = batch.recommend(mf_pipe, users, n=5)
    assert len(fast) == 12
    for (k1, il1), (k2, il2) in zip(plain.items(), fast.items()):
        assert k1 == k2
        assert list(il1.ids()) == list(il2.ids())


def test_flatten_user_ids():
    from lkpy_tpu.batch import _flatten_user_ids
    from lkpy_tpu.data import RecQuery

    assert list(_flatten_user_ids([1, 2, np.int64(3)])) == [1, 2, 3]
    assert list(_flatten_user_ids([("a",), ("b",)])) == ["a", "b"]
    assert _flatten_user_ids([(1, 2)]) is None  # compound keys
    assert _flatten_user_ids([RecQuery(user_id=1)]) is None  # needs per-query path
