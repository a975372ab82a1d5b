"""
TPU hardware lane (VERDICT r2 #7): the TPU-only branches, on a real chip.

Run with ``LKT_TPU_TESTS=1 python -m pytest -m tpu tests/tpu -q`` — the
normal suite forces the 8-device CPU platform, so every
``jax.default_backend() == "tpu"`` branch (compiled Pallas dispatch,
blocked-solve routing, approx_max_k retrieval, warm_epoch_programs,
bf16 Gram) otherwise ships tested only by bench.py (reference analog:
the accel kernels are exercised through the normal suite,
/root/reference/tests/accel/).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs a real TPU backend"),
]


@pytest.fixture()
def rng():
    # function-scoped: each test gets the same stream regardless of which
    # other tests ran (a shared stream made tolerances order-dependent)
    return np.random.default_rng(42)


def test_pallas_spd_solve_compiled(rng):
    """Pallas GJ solve runs COMPILED (not interpreted) and matches LAPACK."""
    from lkpy_tpu.ops.pallas_solve import _interpret, spd_solve

    assert not _interpret()
    B, k = 512, 64
    M = rng.standard_normal((B, k, k)).astype(np.float32) * 0.1
    A = np.einsum("bij,bkj->bik", M, M) + np.eye(k, dtype=np.float32)[None] * 2
    y = rng.standard_normal((B, k)).astype(np.float32)
    x = np.asarray(spd_solve(jnp.asarray(A), jnp.asarray(y)))
    x_ref = np.linalg.solve(A, y[:, :, None])[:, :, 0]
    np.testing.assert_allclose(x, x_ref, atol=1e-4, rtol=1e-3)


def test_pallas_mips_topk_compiled(rng):
    """Compiled kernel ranking matches the f64 oracle; values agree within
    the MXU's default-precision (bf16-input) matmul tolerance — the same
    contract as the XLA retrieval path on TPU."""
    from lkpy_tpu.ops.pallas_topk import mips_topk

    B, N, D, k = 64, 2048, 32, 10
    Q = rng.standard_normal((B, D)).astype(np.float32)
    I = rng.standard_normal((N, D)).astype(np.float32)
    vals, idx = mips_topk(Q, I, k)
    vals, idx = np.asarray(vals), np.asarray(idx)
    S = Q.astype(np.float64) @ I.T.astype(np.float64)
    exp_idx = np.argsort(-S, axis=1)[:, :k]
    recall = sum(len(set(idx[b]) & set(exp_idx[b])) for b in range(B)) / (B * k)
    assert recall >= 0.99, recall
    # returned values are the scores of the returned items (MXU tolerance)
    at_idx = np.take_along_axis(S, idx, axis=1)
    np.testing.assert_allclose(vals, at_idx, atol=5e-3, rtol=5e-3)


def test_blocked_solve_routing_and_pooled_half(rng):
    """A TPU half-epoch (pooled blocked solves + bf16 Gram) matches the
    numpy normal-equation oracle within bf16 Gram tolerance."""
    import scipy.sparse as sps

    from lkpy_tpu.data.matrix import CSR
    from lkpy_tpu.ops.als import als_half_epoch, chunk_buckets
    from lkpy_tpu.ops.sparse import bucket_rows

    n_rows, n_cols, k = 40_000, 300, 16  # > _BLOCKED_MIN_ROWS -> pooled path
    mat = sps.random(n_rows, n_cols, density=0.01, random_state=7, format="csr")
    mat.data = rng.uniform(1, 40, size=mat.nnz).astype(np.float32)
    csr = CSR.from_scipy(mat)
    right = rng.standard_normal((n_cols, k)).astype(np.float32) * 0.1
    chunks = chunk_buckets(bucket_rows(csr, field="rating"))
    left, _delta = als_half_epoch(
        chunks, jnp.zeros((n_rows, k)), jnp.asarray(right), 0.1, mode="implicit"
    )
    left = np.asarray(left)

    # numpy oracle on a row sample
    otor = right.T @ right + 0.1 * np.eye(k, dtype=np.float32)
    sample = rng.choice(n_rows, 100, replace=False)
    for r in sample:
        s, e = int(csr.rowptr[r]), int(csr.rowptr[r + 1])
        if s == e:
            continue
        G = right[csr.colind[s:e]]
        c = csr.values[s:e]
        A = otor + (G * c[:, None]).T @ G
        y = G.T @ (c + 1.0)
        x = np.linalg.solve(A, y)
        # bf16 Gram inputs perturb A by ~4e-3 relative (confidences up to
        # 40); the solve amplifies by the row condition number
        np.testing.assert_allclose(left[r], x, atol=2e-2, rtol=2e-2)


def test_retrieval_approx_recall(rng):
    """approx_max_k large-catalog retrieval keeps recall@k >= 0.95."""
    from lkpy_tpu.ops.topk import FUSED_RETRIEVAL_MIN_ITEMS, retrieval_topk

    N = FUSED_RETRIEVAL_MIN_ITEMS
    B, D, k = 256, 32, 100
    Q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    I = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    av, ai = retrieval_topk(Q, I, k, exact=False)
    ev, ei = retrieval_topk(Q, I, k, exact=True)
    ai, ei = np.asarray(ai), np.asarray(ei)
    hits = sum(len(set(ai[b]) & set(ei[b])) for b in range(B))
    recall = hits / (B * k)
    assert recall >= 0.95, recall


def test_warm_epoch_programs_runs(rng):
    import scipy.sparse as sps

    from lkpy_tpu.data.matrix import CSR
    from lkpy_tpu.ops.als import chunk_buckets, warm_epoch_programs
    from lkpy_tpu.ops.sparse import bucket_rows

    mat = sps.random(1000, 400, density=0.02, random_state=3, format="csr")
    mat.data = np.abs(mat.data).astype(np.float32) + 1
    ui = CSR.from_scipy(mat)
    iu = ui.transpose()
    u_b = chunk_buckets(bucket_rows(ui, field="rating"))
    i_b = chunk_buckets(bucket_rows(iu, field="rating"))
    warm_epoch_programs(u_b, i_b, 1000, 400, 8, "implicit")


def test_knn_gram_path_bf16(rng):
    """The bf16 Gram accumulation similarity build matches the dense-path
    oracle within bf16 tolerance (forced via a tiny dense budget)."""
    import scipy.sparse as sps

    from lkpy_tpu.data.matrix import CSR
    from lkpy_tpu.ops.knn import similarity_topk

    mat = sps.random(300, 2000, density=0.02, random_state=11, format="csr")
    mat.data = rng.uniform(0.1, 1.0, size=mat.nnz).astype(np.float32)
    norms = np.sqrt(np.asarray(mat.multiply(mat).sum(axis=1))).ravel()
    norms[norms == 0] = 1.0
    csr = CSR.from_scipy((sps.diags(1.0 / norms) @ mat).tocsr())
    dense = similarity_topk(csr, 10, approx=False)
    gram = similarity_topk(
        csr, 10, approx=False, max_dense_bytes=300 * 2000  # forces Gram chunks
    )
    np.testing.assert_allclose(gram.sims, dense.sims, atol=5e-3)


def test_device_batch_serving_approx(rng):
    """device_recommend's hardware-TopK method agrees with exact on TPU."""
    import pandas as pd
    from types import SimpleNamespace

    from lkpy_tpu.batch.device import device_recommend
    from lkpy_tpu.data import from_interactions_df

    n_users, n_items, k = 300, 1000, 16
    hist = pd.DataFrame(
        {
            "user_id": np.repeat(np.arange(n_users), 20),
            "item_id": rng.integers(0, n_items, n_users * 20),
        }
    ).drop_duplicates()
    ds = from_interactions_df(hist)
    matrix = ds.interaction_matrix()
    scorer = SimpleNamespace(
        user_embeddings=rng.standard_normal((ds.user_count, k)).astype(np.float32),
        item_embeddings=rng.standard_normal((ds.item_count, k)).astype(np.float32),
        config=SimpleNamespace(user_embeddings="prefer"),
    )
    users = np.asarray(ds.users.ids)[:128]
    exact = device_recommend(scorer, users, 10, matrix, exact=True)
    approx = device_recommend(scorer, users, 10, matrix, exact=False)
    agree = sum(
        len(set(a.ids()) & set(b.ids())) for (_, a), (_, b) in zip(exact.items(), approx.items())
    )
    assert agree / (len(users) * 10) >= 0.95


def test_gj_lanes_solver_compiled(rng):
    """Round-4 blocked batch-on-lanes GJ solver, compiled on the chip: both
    entry points, k=64 and the k%8 pad path."""
    from lkpy_tpu.ops.pallas_gj import _interpret, spd_solve_lanes, spd_solve_lanes_chunked

    assert not _interpret()
    B, k = 640, 64
    M = rng.standard_normal((B, k, k)).astype(np.float32) * 0.1
    A = np.einsum("bij,bkj->bik", M, M) + np.eye(k, dtype=np.float32)[None] * 2
    y = rng.standard_normal((B, k)).astype(np.float32)
    x = np.asarray(spd_solve_lanes(jnp.asarray(np.transpose(A, (1, 2, 0))), jnp.asarray(y.T)))
    x_ref = np.linalg.solve(A, y[:, :, None])[:, :, 0]
    np.testing.assert_allclose(x.T, x_ref, atol=1e-4, rtol=1e-3)

    C, Bc = 2, 256
    Ac = jnp.asarray(np.transpose(A[: C * Bc].reshape(C, Bc, k, k), (0, 2, 3, 1)))
    yc = jnp.asarray(np.transpose(y[: C * Bc].reshape(C, Bc, k), (0, 2, 1)))
    xc = np.asarray(spd_solve_lanes_chunked(Ac, yc))
    np.testing.assert_allclose(
        np.transpose(xc, (0, 2, 1)).reshape(C * Bc, k), x_ref[: C * Bc], atol=1e-4, rtol=1e-3
    )


def test_fused_als_bucket_matches_oracle(rng):
    """The fused gather->Gram->GJ->scatter bucket program (the round-4 ALS
    epoch path) against per-row LAPACK, on the compiled TPU path."""
    import scipy.linalg as sla

    from lkpy_tpu.ops import als as als_ops

    n_rows, n_right, k = 300, 500, 64
    right = rng.standard_normal((n_right, k)).astype(np.float32) * 0.1
    P = 24
    cols = rng.integers(0, n_right, size=(1, n_rows, P)).astype(np.int32)
    conf = rng.uniform(1, 5, size=(1, n_rows, P)).astype(np.float32)
    mask = np.ones((1, n_rows, P), bool)
    mask[0, :, P - 4 :] = False  # ragged tails
    otor = np.asarray(als_ops.implicit_otor(jnp.asarray(right), jnp.float32(0.1)))
    ch = als_ops.ChunkedRows(
        jnp.asarray(np.arange(n_rows, dtype=np.int32).reshape(1, n_rows)),
        jnp.asarray(cols),
        jnp.asarray(conf),
        jnp.asarray(mask),
    )
    left, dsq = als_ops._fused_bucket_implicit(
        jnp.zeros((n_rows, k), jnp.float32),
        jnp.float32(0.0),
        ch.rows,
        ch.cols,
        ch.values,
        ch.mask,
        jnp.asarray(right),
        jnp.asarray(otor),
    )
    got = np.asarray(left)
    for r in [0, 17, 299]:
        ii = cols[0, r][mask[0, r]]
        cc = conf[0, r][mask[0, r]]
        Mr = right[ii]
        Ar = otor + (Mr.T * cc) @ Mr
        yr = Mr.T @ (cc + 1.0)
        exp = sla.cho_solve(sla.cho_factor(Ar), yr)
        np.testing.assert_allclose(got[r], exp, atol=2e-2 * np.abs(exp).max())


def test_dense_adjacency_propagate_matches_segment(rng):
    """Dense bf16 MXU propagation vs the sorted segment-sum form, compiled
    on the chip (bf16 slab tolerance)."""
    from lkpy_tpu.ops.graph import build_dense_adjacency, propagate, propagate_dense, sorted_conv

    n_u, n_i, k, nnz = 500, 300, 32, 5000
    rows = np.sort(rng.integers(0, n_u, nnz).astype(np.int32))
    cols = rng.integers(0, n_i, nnz).astype(np.int32)
    # dedupe (row, col) so the scatter-set build matches the edge list
    keys = np.unique(rows.astype(np.int64) * n_i + cols)
    rows = (keys // n_i).astype(np.int32)
    cols = (keys % n_i).astype(np.int32)
    vals = rng.uniform(0.01, 0.1, len(keys)).astype(np.float32)
    u = rng.standard_normal((n_u, k)).astype(np.float32)
    i = rng.standard_normal((n_i, k)).astype(np.float32)
    blend = jnp.asarray(np.full(3, 1 / 3, np.float32))

    conv = sorted_conv(rows, cols, vals, n_u, n_i)
    su, si = propagate(jnp.asarray(u), jnp.asarray(i), conv, blend)
    adj = build_dense_adjacency(conv[0], conv[1], conv[2], n_u, n_i)
    du, di = propagate_dense(jnp.asarray(u), jnp.asarray(i), adj, blend)
    np.testing.assert_allclose(np.asarray(du), np.asarray(su), atol=5e-2)
    np.testing.assert_allclose(np.asarray(di), np.asarray(si), atol=5e-2)


def test_bloom_negative_sampling_compiled(rng):
    """Bloom-verified sampling on the chip: no sampled negative may be a
    true interaction."""
    import scipy.sparse as sps

    from lkpy_tpu.data.matrix import CSR
    from lkpy_tpu.ops.sampling import DeviceCSRIndex, sample_negatives

    mat = sps.random(200, 500, density=0.08, random_state=11, format="csr")
    csr = CSR.from_scipy(mat)
    index = DeviceCSRIndex.from_csr(csr)
    assert index.bloom is not None
    rows = jnp.asarray(np.repeat(np.arange(200, dtype=np.int32), 8))
    negs = np.asarray(sample_negatives(jax.random.key(5), index, rows, n=2))
    sp = csr.to_scipy(structural=True)
    rr = np.repeat(np.repeat(np.arange(200), 8), 2)
    assert not (np.asarray(sp[rr, negs.ravel()]).ravel() > 0).any()


def test_serving_engine_compact_readback_and_pipelining(rng):
    """The round-5 serving engine on real hardware: compact f16/u16
    readback stays rank-faithful to the f32 path, async pipelining gives
    identical results, and the transport trace reports O(1) operations."""
    import pandas as pd

    from lkpy_tpu.batch.device import device_recommend, device_recommend_async
    from lkpy_tpu.config import configure
    from lkpy_tpu.data import from_interactions_df
    from lkpy_tpu.models.als import ImplicitMFScorer
    from lkpy_tpu.ops import als as als_ops

    n_users, n_items, k = 400, 800, 16
    hist = pd.DataFrame(
        {
            "user_id": np.repeat(np.arange(n_users), 15),
            "item_id": rng.integers(0, n_items, n_users * 15),
        }
    ).drop_duplicates()
    ds = from_interactions_df(hist)
    matrix = ds.interaction_matrix()
    s = ImplicitMFScorer(ImplicitMFScorer.validate_config({"features": k}))
    s.users, s.items = ds.users, ds.items
    s.user_embeddings = rng.standard_normal((ds.user_count, k)).astype(np.float32)
    s.item_embeddings = rng.standard_normal((ds.item_count, k)).astype(np.float32)
    s._OtOr = np.asarray(als_ops.implicit_otor(jnp.asarray(s.item_embeddings), jnp.float32(0.1)))

    users = np.asarray(ds.users.ids)[:256]
    tm: dict = {}
    compact = device_recommend(s, users, 10, matrix, timings=tm)
    # O(1) transport: upload + groups + concat + readback (resident CSR
    # upload only appears on the first call)
    assert tm["tunnel_ops"] <= 12
    labels = [t[0] for t in tm["trace"]]
    assert any(l.startswith("readback") for l in labels)
    with configure(serving={"readback_precision": "f32"}):
        full = device_recommend(s, users, 10, matrix)
    for (k1, a), (k2, b) in zip(compact.items(), full.items()):
        assert k1 == k2
        assert list(a.ids()) == list(b.ids())  # ranking identical
        np.testing.assert_allclose(a.scores(), b.scores(), rtol=2e-3, atol=2e-3)

    # pipelined == sequential
    h1 = device_recommend_async(s, users[:100], 10, matrix)
    h2 = device_recommend_async(s, users[100:200], 10, matrix)
    r1, r2 = h1.result(), h2.result()
    for uid in users[:100]:
        a = r1.lookup(int(uid))
        b = compact.lookup(int(uid))
        assert list(a.ids()) == list(b.ids())


def test_knn_resident_gram_build_tpu(rng):
    """The device-resident Gram path (round 5) matches the exact build."""
    import scipy.sparse as sps

    from lkpy_tpu.data.matrix import CSR
    from lkpy_tpu.ops.knn import normalize_item_matrix, similarity_topk

    mat = sps.random(3000, 5000, density=0.01, random_state=7, format="csr")  # users x items... transposed below
    mat.data = np.ones(mat.nnz, dtype=np.float32)
    ui = CSR.from_scipy(mat)
    iu = ui.transpose()
    if iu.values is None:
        iu = iu.with_values(np.ones(iu.nnz, dtype=np.float32))
    normed, _ = normalize_item_matrix(iu, explicit=False)
    resident = similarity_topk(
        normed, 16, max_dense_bytes=8 << 20, user_major=ui, recall_validate=False
    )
    plain = similarity_topk(normed, 16, max_dense_bytes=8 << 20, recall_validate=False)
    # identical neighbor sets on an overwhelming majority of rows (approx
    # top-k tie-breaks may differ between runs)
    same = sum(
        set(resident.indices[r][resident.sims[r] > 0])
        == set(plain.indices[r][plain.sims[r] > 0])
        for r in range(resident.n_items)
    )
    assert same / resident.n_items >= 0.98
