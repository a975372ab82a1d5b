"""Shared residency-cache behavior (lkpy_tpu/utils/residency.py)."""

from __future__ import annotations

import gc

import numpy as np

from lkpy_tpu.utils.residency import ResidentCache, invalidate_all_residency


class Anchor:
    pass


def test_identity_guard_and_lifetime():
    c = ResidentCache("t1", max_entries=4)
    a = Anchor()
    c.put(a, "payload")
    assert c.get(a) == "payload"
    assert c.get(Anchor()) is None
    del a
    gc.collect()
    assert len(c) == 0  # weakref finalizer dropped the entry


def test_extra_key_separates_entries():
    c = ResidentCache("t2", max_entries=4)
    a = Anchor()
    c.put(a, 1, extra="x")
    c.put(a, 2, extra="y")
    assert c.get(a, extra="x") == 1
    assert c.get(a, extra="y") == 2
    assert c.get(a, extra="z") is None


def test_fifo_bound():
    c = ResidentCache("t3", max_entries=2)
    anchors = [Anchor() for _ in range(3)]
    for i, a in enumerate(anchors):
        c.put(a, i)
    assert len(c) == 2
    assert c.get(anchors[0]) is None  # evicted first
    assert c.get(anchors[2]) == 2


def test_invalidate_all_sweeps_registered_caches():
    c = ResidentCache("t4", max_entries=4)
    a = Anchor()
    c.put(a, "v")
    invalidate_all_residency()
    assert c.get(a) is None


def test_device_cache_invalidation_sweeps_knn_and_serving():
    """invalidate_device_cache's documented contract (round-5 review)."""
    from lkpy_tpu.batch.device import invalidate_device_cache
    from lkpy_tpu.data.matrix import CSR
    from lkpy_tpu.ops import knn as K

    rows = np.array([0, 0, 1]); cols = np.array([0, 1, 1])
    csr = CSR.from_coo(rows, cols, np.ones(3, np.float32), (2, 2))
    normed, _ = K.normalize_item_matrix(csr, explicit=False)
    assert K._get_row_scale(normed) is not None
    invalidate_device_cache()
    assert K._get_row_scale(normed) is None
