"""Round-4 probe: where do the 12.7s of the 27k-item kNN build go?

Phases: host chunk prep, H2D transfer, device densify+Gram accumulation,
threshold+top-k tiles, recall validation.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench
from lkpy_tpu.config import ensure_compile_cache

ensure_compile_cache()
import jax
import jax.numpy as jnp

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops import knn as knn_ops

rng = np.random.default_rng(42)
all_u, all_i = bench.synth_interactions(rng)
train_mask, test_u, test_i = bench.split_holdout(all_u, all_i, rng)
tr_u, tr_i = all_u[train_mask], all_i[train_mask]
vals = np.full(len(tr_u), 40.0, dtype=np.float32)
ui = CSR.from_coo(tr_u, tr_i, vals, (bench.N_USERS, bench.N_ITEMS))
iu = ui.transpose()
normed, _means = knn_ops.normalize_item_matrix(iu, explicit=False)
print("data ready", flush=True)

# full build (warm programs first with one run)
t0 = time.time()
table = knn_ops.similarity_topk(normed, 64)
print(f"full build (cold programs): {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
table = knn_ops.similarity_topk(normed, 64)
print(f"full build (warm): {time.time()-t0:.2f}s", flush=True)

# phase timing (mirrors similarity_topk's gram path)
n_items, n_users = normed.shape
max_dense_bytes = 4 << 30
user_chunk = max(max_dense_bytes // (n_items * 4), 1024)
ui_csr = normed.transpose()
t0 = time.time()
chunks = []
for ulo in range(0, n_users, user_chunk):
    uhi = min(ulo + user_chunk, n_users)
    s, e = int(ui_csr.rowptr[ulo]), int(ui_csr.rowptr[uhi])
    lens = (ui_csr.rowptr[ulo + 1 : uhi + 1] - ui_csr.rowptr[ulo:uhi]).astype(np.int64)
    rel = np.repeat(np.arange(uhi - ulo, dtype=np.int32), lens)
    chunks.append((rel, ui_csr.colind[s:e], ui_csr.values[s:e]))
print(f"host chunk prep: {time.time()-t0:.2f}s ({len(chunks)} chunks, user_chunk={user_chunk})", flush=True)

nnz_pad = max(knn_ops._pad_pow2(max(len(c[0]) for c in chunks)), 8)
t0 = time.time()
dev_chunks = []
for rel, cc, vv in chunks:
    pad = nnz_pad - len(rel)
    rel = np.pad(rel, (0, pad), constant_values=user_chunk)
    cc = np.pad(cc, (0, pad))
    vv = np.pad(vv, (0, pad))
    dev_chunks.append((jnp.asarray(rel), jnp.asarray(cc), jnp.asarray(vv.astype(np.float32))))
for t in dev_chunks:
    jax.block_until_ready(t)
_ = float(jnp.sum(dev_chunks[-1][2]))
print(f"pad + H2D transfer: {time.time()-t0:.2f}s (nnz_pad={nnz_pad})", flush=True)

t0 = time.time()
S = jnp.zeros((n_items, n_items), dtype=jnp.float32)
for rel_j, cc_j, vv_j in dev_chunks:
    S = knn_ops._gram_accum_sparse(S, rel_j, cc_j, vv_j, user_chunk, n_items, True)
    jax.block_until_ready(S)
_ = float(jnp.sum(S))
print(f"densify+gram accumulation: {time.time()-t0:.2f}s", flush=True)

# separate: densify-only vs matmul-only cost for one chunk
rel_j, cc_j, vv_j = dev_chunks[0]


@jax.jit
def densify_only(rel, cc, vv):
    U = jnp.zeros((user_chunk, n_items), dtype=jnp.bfloat16)
    return U.at[rel, cc].set(vv.astype(jnp.bfloat16), mode="drop")


U = densify_only(rel_j, cc_j, vv_j)
_ = float(jnp.sum(U.astype(jnp.float32)))
t0 = time.time()
U = densify_only(rel_j, cc_j, vv_j)
_ = float(jnp.sum(U.astype(jnp.float32)))
print(f"  densify only (1 chunk): {time.time()-t0:.2f}s", flush=True)


@jax.jit
def matmul_only(U):
    return jnp.dot(U.T, U, preferred_element_type=jnp.float32)


S2 = matmul_only(U)
_ = float(jnp.sum(S2))
t0 = time.time()
S2 = matmul_only(U)
_ = float(jnp.sum(S2))
print(f"  matmul only (1 chunk): {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
min_sim_j = jnp.float32(1e-6)
out_idx = np.empty((n_items, 64), dtype=np.int32)
out_sim = np.empty((n_items, 64), dtype=np.float32)
tile = 2048
for lo in range(0, n_items, tile):
    start = min(lo, n_items - tile)
    sims, idx = knn_ops._tile_topk_at(S, jnp.int32(start), min_sim_j, 64, tile, True)
    off = lo - start
    out_sim[lo : start + tile] = np.asarray(sims)[off:]
    out_idx[lo : start + tile] = np.asarray(idx)[off:]
print(f"threshold+topk tiles: {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
rec = knn_ops._sample_recall(
    lambda s, rows: knn_ops._tile_topk_at(S, jnp.int32(s), min_sim_j, 64, rows, False),
    out_idx, 64, n_items,
)
print(f"recall validation: {time.time()-t0:.2f}s (recall={rec:.4f})", flush=True)
