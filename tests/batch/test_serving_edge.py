"""Serving-engine edge cases the property sweep doesn't reach: resident
cache behavior, tiny/degenerate batches, settings interplay, and the
timing/trace contract (`lkpy_tpu.batch.serving`)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.batch.device import device_recommend, invalidate_device_cache
from lkpy_tpu.batch.serving import _resident_csr, invalidate_resident, scalar_dev
from lkpy_tpu.config import configure
from lkpy_tpu.data import from_interactions_df
from lkpy_tpu.models.als import ImplicitMFScorer
from lkpy_tpu.ops import als as als_ops


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(9)
    nu, ni, k = 30, 40, 8
    df = pd.DataFrame(
        {
            "user_id": np.repeat(np.arange(nu), 5),
            "item_id": rng.integers(0, ni, nu * 5),
        }
    ).drop_duplicates()
    ds = from_interactions_df(df)
    s = ImplicitMFScorer(ImplicitMFScorer.validate_config({"features": k}))
    s.users, s.items = ds.users, ds.items
    s.user_embeddings = rng.standard_normal((ds.user_count, k)).astype(np.float32)
    s.item_embeddings = rng.standard_normal((ds.item_count, k)).astype(np.float32)
    import jax.numpy as jnp

    s._OtOr = np.asarray(als_ops.implicit_otor(jnp.asarray(s.item_embeddings), jnp.float32(0.1)))
    return ds, s


def test_resident_csr_cached_by_identity(small):
    ds, s = small
    csr = ds.interaction_matrix().csr("rating")
    a = _resident_csr(csr, False)
    b = _resident_csr(csr, False)
    assert a[0] is b[0] and a[1] is b[1]
    invalidate_resident()
    c = _resident_csr(csr, False)
    assert c[1] is not a[1]


def test_resident_csr_needs_vals_guard(small):
    ds, s = small
    csr = ds.interaction_matrix().csr("rating")
    if csr.values is None:
        with pytest.raises(ValueError):
            _resident_csr(csr, True)


def test_scalar_dev_cached():
    a = scalar_dev(0.25)
    assert scalar_dev(0.25) is a
    assert float(scalar_dev(1.5)) == 1.5


def test_single_user_batch(small):
    ds, s = small
    out = device_recommend(s, [int(ds.users.ids[3])], 5, ds.interaction_matrix())
    il = out.lookup(int(ds.users.ids[3]))
    assert len(il) == 5


def test_all_unknown_users(small):
    ds, s = small
    out = device_recommend(s, [111111, 222222], 5, ds.interaction_matrix())
    assert len(out) == 2
    assert all(len(il) == 0 for _, il in out.items())


def test_n_larger_than_catalog(small):
    """Requesting more recommendations than the catalog returns shorter
    ranked lists instead of crashing (bug found by the property sweep)."""
    ds, s = small
    uid = int(ds.users.ids[0])
    out = device_recommend(s, [uid], 10_000, ds.interaction_matrix())
    il = out.lookup(uid)
    hist = len(ds.user_row(uid))
    assert len(il) == ds.item_count - hist  # everything except history


def test_timings_trace_contract(small):
    ds, s = small
    tm: dict = {}
    device_recommend(s, ds.users.ids[:8], 5, ds.interaction_matrix(), timings=tm)
    assert set(tm) >= {"enqueue_s", "readback_s", "tunnel_ops", "trace"}
    assert tm["tunnel_ops"] == len(tm["trace"])
    for label, dt, nbytes in tm["trace"]:
        assert isinstance(label, str) and dt >= 0 and nbytes >= 0
    kinds = {label.split(":")[0] for label, *_ in tm["trace"]}
    assert kinds <= {"upload", "dispatch", "readback"}


def test_readback_precision_pinned_f16(small):
    """Pinning f16 readback off-TPU still ranks identically to f32."""
    ds, s = small
    users = ds.users.ids[:10]
    with configure(serving={"readback_precision": "f16"}):
        a = device_recommend(s, users, 5, ds.interaction_matrix())
    with configure(serving={"readback_precision": "f32"}):
        b = device_recommend(s, users, 5, ds.interaction_matrix())
    for (k1, il1), (k2, il2) in zip(a.items(), b.items()):
        assert list(il1.ids()) == list(il2.ids())
        np.testing.assert_allclose(il1.scores(), il2.scores(), rtol=2e-3, atol=2e-3)


def test_invalidate_device_cache_clears_resident(small):
    ds, s = small
    csr = ds.interaction_matrix().csr("rating")
    a = _resident_csr(csr, False)
    invalidate_device_cache()
    b = _resident_csr(csr, False)
    assert b[1] is not a[1]


def test_empty_user_batch_returns_empty_collection():
    """Regression (round-5 review): zero users -> empty ILC, not a crash."""
    import numpy as np
    import pandas as pd

    from lkpy_tpu.data import from_interactions_df
    from lkpy_tpu.batch.device import device_recommend
    from lkpy_tpu.models.als import ImplicitMFScorer

    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {"user_id": rng.integers(0, 50, 500), "item_id": rng.integers(0, 40, 500)}
    ).drop_duplicates()
    ds = from_interactions_df(df)
    m = ds.interaction_matrix()
    m.csr(None)
    sc = ImplicitMFScorer(ImplicitMFScorer.validate_config({"features": 4, "epochs": 1}))
    sc.train(ds)
    recs = device_recommend(sc, [], 5, m)
    assert len(recs) == 0


def test_f16_compact_readback_clamps_large_scores():
    """Regression (round-5 review): scores past the f16 range must clamp,
    not overflow to inf and be dropped as masked padding."""
    import numpy as np
    import pandas as pd

    from lkpy_tpu.data import from_interactions_df
    from lkpy_tpu.batch.device import device_recommend
    from lkpy_tpu.models.als import ImplicitMFScorer

    rng = np.random.default_rng(1)
    df = pd.DataFrame(
        {"user_id": rng.integers(0, 40, 600), "item_id": rng.integers(0, 50, 600)}
    ).drop_duplicates()
    ds = from_interactions_df(df)
    m = ds.interaction_matrix()
    m.csr(None)
    sc = ImplicitMFScorer(ImplicitMFScorer.validate_config({"features": 8, "epochs": 1}))
    sc.train(ds)
    # inflate the tables so top scores exceed the f16 max (65504)
    sc.user_embeddings = np.asarray(sc.user_embeddings) * 4000.0
    sc.item_embeddings = np.asarray(sc.item_embeddings) * 4000.0
    from lkpy_tpu.batch.device import invalidate_device_cache

    invalidate_device_cache()
    uids = np.asarray(ds.users.ids)[:8]
    from lkpy_tpu.config import configure

    with configure(serving={"readback_precision": "f16"}):
        recs_f16 = device_recommend(sc, uids, 5, m, exact=True)
    for u in uids:
        il = recs_f16.lookup(int(u))
        n_cand = ds.item_count - len(m.row_items(int(u)))
        assert len(il) == min(5, n_cand), int(u)
        assert np.isfinite(il.scores()).all()
