"""
Regression: the resident/packed kNN fast path must stay eligible when a
generous ``max_dense_bytes`` budget would otherwise produce user chunks
past the uint16 chunk-relative row limit (measured 4.6 s vs 2.4 s builds
at the 27k-item bench shape; see ops/knn.py chunk cap).
"""

from __future__ import annotations

import numpy as np
import pytest

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops import knn as K


@pytest.fixture(scope="module")
def big_user_matrix():
    rng = np.random.default_rng(0)
    n_users, n_items = 70_000, 100
    u = rng.integers(0, n_users, 200_000)
    i = rng.integers(0, n_items, 200_000)
    uniq = np.unique(u * n_items + i)
    u, i = uniq // n_items, uniq % n_items
    ui = CSR.from_coo(u, i, np.full(len(u), 3.0, np.float32), (n_users, n_items))
    return ui, ui.transpose()


def test_resident_path_engages_despite_large_budget(big_user_matrix):
    ui, iu = big_user_matrix
    normed, _ = K.normalize_item_matrix(iu, explicit=False)
    K._resident_struct.clear()
    before = len(K._resident_struct)
    # 20 MB budget with 100 items would give a >100k-user chunk without the
    # uint16 cap — the resident structure must still be built and used
    table = K.similarity_topk(
        normed, 8, bf16=True, user_major=ui, approx=False, max_dense_bytes=20 << 20
    )
    assert len(K._resident_struct) > before
    assert table.k == 8

    # and the chunked resident build matches the single-densify exact oracle
    oracle = K.similarity_topk(normed, 8, approx=False)
    # compare neighbor sets per item (sims in bf16 vs f32 may reorder ties)
    tc, oc = table.counts(), oracle.counts()
    for row in range(0, table.n_items, 17):
        got = set(np.asarray(table.indices[row])[: int(tc[row])].tolist())
        want = set(np.asarray(oracle.indices[row])[: int(oc[row])].tolist())
        overlap = len(got & want) / max(len(want), 1)
        assert overlap >= 0.75, (row, got, want)


def test_resident_struct_cache_reused(big_user_matrix):
    ui, iu = big_user_matrix
    normed, _ = K.normalize_item_matrix(iu, explicit=False)
    K.similarity_topk(normed, 8, bf16=True, user_major=ui, approx=False, max_dense_bytes=20 << 20)
    n_after_first = len(K._resident_struct)
    K.similarity_topk(normed, 8, bf16=True, user_major=ui, approx=False, max_dense_bytes=20 << 20)
    # same user_major object + same chunking -> no new resident uploads
    assert len(K._resident_struct) == n_after_first
