"""
Sharded item-item similarity build.

The distributed form of the kNN similarity pass (reference: rayon streaming
CSR row sweep, src/accel/knn/item_train.rs:95): similarity rows shard over
the mesh's ``model`` axis and are accumulated ALX-style from sparse *user*
chunks — each device owns a (rows_per, n_items) block of S and, for every
user chunk U (densified on device, host→device traffic O(nnz)), adds
``U[:, my_rows]ᵀ @ U`` on the MXU.  Because sharding is by *output* row,
each device's threshold+top-k is already global for its rows — no merge
collective is needed.

Memory story (the point of sharding): per device this holds one
(rows_per, n_items) similarity block — the n_items² ceiling divided by the
mesh — plus one bounded (user_chunk, n_items) scratch slab.  The dense
item×user matrix is NEVER materialized anywhere (for ML-20M, 27k×138k f32
≈ 15 GB — it must not be); only the n_items-wide user slabs exist, sized by
``max_dense_bytes``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.knn import NeighborTable, _pad_pow2
from lkpy_tpu.parallel.mesh import get_mesh

__all__ = ["sharded_similarity_topk"]


def sharded_similarity_topk(
    iu_csr: CSR,
    k: int,
    min_sim: float = 1.0e-6,
    *,
    mesh: Mesh | None = None,
    axis: str = "model",
    max_dense_bytes: int = 1 << 30,
) -> NeighborTable:
    """
    Top-K thresholded cosine similarity with S-rows sharded over ``axis``.

    ``iu_csr`` must already be normalized (items × users).  Matches
    :func:`lkpy_tpu.ops.knn.similarity_topk` exactly (exact top-k path).
    ``max_dense_bytes`` bounds the per-device dense user-slab scratch.
    """
    mesh = mesh or get_mesh()
    d = mesh.shape[axis]
    n_items, n_users = iu_csr.shape
    k = min(k, max(n_items - 1, 1))
    min_sim_j = jnp.float32(max(min_sim, float(np.finfo(np.float32).smallest_normal)))

    Np = -(-n_items // d) * d
    rows_per = Np // d
    block_shard = NamedSharding(mesh, P(axis, None))

    # user-major sweep: chunk users so the on-device dense slab stays within
    # the scratch budget
    ui_csr = iu_csr.transpose()
    user_chunk = int(max(max_dense_bytes // (Np * 4), 256))
    user_chunk = min(user_chunk, n_users)

    def accum_local(S_loc, rel, cols, vals):
        # densify this user chunk on device; padding entries carry OOB rows
        U = jnp.zeros((user_chunk, Np), jnp.float32).at[rel, cols].set(vals, mode="drop")
        shard = jax.lax.axis_index(axis)
        Uc = jax.lax.dynamic_slice(U, (0, shard * rows_per), (user_chunk, rows_per))
        return S_loc + jnp.dot(Uc.T, U, preferred_element_type=jnp.float32)

    accum = jax.jit(
        jax.shard_map(
            accum_local,
            mesh=mesh,
            in_specs=(P(axis, None), P(), P(), P()),
            out_specs=P(axis, None),
            check_vma=False,
        ),
        donate_argnums=(0,),
    )

    def topk_local(S_loc):
        shard = jax.lax.axis_index(axis)
        row_ids = shard * rows_per + jax.lax.broadcasted_iota(jnp.int32, (rows_per, 1), 0)[:, 0]
        cols = jax.lax.broadcasted_iota(jnp.int32, S_loc.shape, 1)
        S_loc = jnp.where(
            (cols == row_ids[:, None]) | (cols >= n_items) | (S_loc < min_sim_j), 0.0, S_loc
        )
        sims, idx = jax.lax.top_k(S_loc, k)
        return sims, idx.astype(jnp.int32)

    topk = jax.jit(
        jax.shard_map(
            topk_local,
            mesh=mesh,
            in_specs=(P(axis, None),),
            out_specs=(P(axis, None), P(axis, None)),
            check_vma=False,
        ),
        donate_argnums=(0,),
    )

    # chunk the sparse structure on host; pad every chunk to one static nnz
    # width so the accumulate program compiles exactly once
    chunks = []
    for ulo in range(0, n_users, user_chunk):
        uhi = min(ulo + user_chunk, n_users)
        s, e = int(ui_csr.rowptr[ulo]), int(ui_csr.rowptr[uhi])
        lens = (ui_csr.rowptr[ulo + 1 : uhi + 1] - ui_csr.rowptr[ulo:uhi]).astype(np.int64)
        rel = np.repeat(np.arange(uhi - ulo, dtype=np.int32), lens)
        vv = ui_csr.values[s:e] if ui_csr.values is not None else np.ones(e - s, np.float32)
        chunks.append((rel, ui_csr.colind[s:e], vv))
    nnz_pad = max(_pad_pow2(max(len(c[0]) for c in chunks)), 8)

    S = jax.device_put(jnp.zeros((Np, Np), dtype=jnp.float32), block_shard)
    for rel, cc, vv in chunks:
        pad = nnz_pad - len(rel)
        rel = np.pad(rel, (0, pad), constant_values=user_chunk)  # OOB row -> dropped
        cc = np.pad(cc, (0, pad))
        vv = np.pad(vv, (0, pad))
        S = accum(S, jnp.asarray(rel), jnp.asarray(cc), jnp.asarray(vv.astype(np.float32)))
        jax.block_until_ready(S)  # keep the remote queue shallow (donated buffer)

    sims, idx = topk(S)
    return NeighborTable(np.asarray(idx)[:n_items], np.asarray(sims)[:n_items])
