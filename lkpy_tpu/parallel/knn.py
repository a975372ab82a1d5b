"""
Sharded item-item similarity build.

The distributed form of the kNN similarity pass (reference: rayon streaming
CSR row sweep, src/accel/knn/item_train.rs:95): similarity rows shard over
the mesh's ``model`` axis and are accumulated ALX-style from sparse *user*
chunks — each device owns a block of S rows and, for every user chunk U
(densified on device, host→device traffic O(nnz)), adds
``U[:, my_rows]ᵀ @ U`` on the MXU.  Because sharding is by *output* row,
each device's threshold+top-k is already global for its rows — no merge
collective is needed.

Memory story (the point of sharding): the dense item×user matrix is NEVER
materialized anywhere (for ML-20M, 27k×138k f32 ≈ 15 GB — it must not be);
only bounded (user_chunk, n_items) slabs exist, sized by
``max_dense_bytes``.  Two accumulation modes:

- **dense**: each device holds its full (rows_per, n_items) S block —
  one threshold+top-k at the end.  Used when the per-device block fits
  ``sim_block_bytes``.
- **streaming** (the reference's truncation discipline, item_train.rs:95):
  S only ever exists one (sub_rows, n_items) row block at a time per
  device; each block is fully accumulated over all user chunks, then
  immediately thresholded + top-k'd and discarded.  No n_items² tensor
  exists at any point, so catalogs far beyond the dense ceiling build in
  bounded memory (the 500k-item catalog needs ~1 TB dense across any
  realistic mesh — VERDICT r3 weak #6).

Both modes accept the single-device build's ``bf16`` Gram-slab option,
but default to f32: no recall validation exists on the sharded path, so
reduced precision is an explicit opt-in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.knn import NeighborTable, _pad_pow2
from lkpy_tpu.parallel.mesh import get_mesh

__all__ = ["sharded_similarity_topk"]


def _host_chunks(ui_csr: CSR, n_users: int, user_chunk: int):
    """Split the user-major CSR into per-chunk (rel_row, col, val) triples,
    padded to one shared nnz width (single compiled accumulate program)."""
    chunks = []
    for ulo in range(0, n_users, user_chunk):
        uhi = min(ulo + user_chunk, n_users)
        s, e = int(ui_csr.rowptr[ulo]), int(ui_csr.rowptr[uhi])
        lens = (ui_csr.rowptr[ulo + 1 : uhi + 1] - ui_csr.rowptr[ulo:uhi]).astype(np.int64)
        rel = np.repeat(np.arange(uhi - ulo, dtype=np.int32), lens)
        vv = ui_csr.values[s:e] if ui_csr.values is not None else np.ones(e - s, np.float32)
        chunks.append((rel, ui_csr.colind[s:e], vv))
    nnz_pad = max(_pad_pow2(max(len(c[0]) for c in chunks)), 8)
    out = []
    for rel, cc, vv in chunks:
        pad = nnz_pad - len(rel)
        rel = np.pad(rel, (0, pad), constant_values=user_chunk)  # OOB row -> dropped
        cc = np.pad(cc, (0, pad))
        vv = np.pad(vv, (0, pad))
        out.append((jnp.asarray(rel), jnp.asarray(cc), jnp.asarray(vv.astype(np.float32))))
    return out


def sharded_similarity_topk(
    iu_csr: CSR,
    k: int,
    min_sim: float = 1.0e-6,
    *,
    mesh: Mesh | None = None,
    axis: str = "model",
    max_dense_bytes: int = 1 << 30,
    sim_block_bytes: int = 1 << 30,
    bf16: bool | None = None,
) -> NeighborTable:
    """
    Top-K thresholded cosine similarity with S-rows sharded over ``axis``.

    ``iu_csr`` must already be normalized (items × users).  Matches
    :func:`lkpy_tpu.ops.knn.similarity_topk`'s exact-top-k path under the
    same Gram precision (default f32; ``bf16=True`` is an explicit opt-in
    here because no recall validation guards the sharded build).
    ``max_dense_bytes`` bounds the per-device
    dense user-slab scratch; ``sim_block_bytes`` bounds each device's
    resident S block — when a device's full (rows_per, n_items) share
    exceeds it, the build streams row blocks (accumulate → truncate →
    discard) so no n_items² tensor ever exists.
    """
    mesh = mesh or get_mesh()
    d = mesh.shape[axis]
    n_items, n_users = iu_csr.shape
    k = min(k, max(n_items - 1, 1))
    min_sim_j = jnp.float32(max(min_sim, float(np.finfo(np.float32).smallest_normal)))
    if bf16 is None:
        # no recall validation exists on the sharded path, so bf16 must be
        # an explicit opt-in (mirrors the single-device default, which only
        # enables bf16 where the approx-recall check guards it)
        bf16 = False
    slab_dt = jnp.bfloat16 if bf16 else jnp.float32

    Np = -(-n_items // d) * d
    rows_per = Np // d

    ui_csr = iu_csr.transpose()  # user-major
    user_chunk = int(max(max_dense_bytes // (Np * 4), 256))
    user_chunk = min(user_chunk, n_users)
    dev_chunks = _host_chunks(ui_csr, n_users, user_chunk)

    if rows_per * Np * 4 <= sim_block_bytes:
        return _dense_build(
            dev_chunks, mesh, axis, d, n_items, Np, rows_per, user_chunk, k, min_sim_j, slab_dt
        )
    return _streaming_build(
        dev_chunks,
        mesh,
        axis,
        d,
        n_items,
        n_users,
        user_chunk,
        k,
        min_sim_j,
        slab_dt,
        sim_block_bytes,
    )


def _dense_build(dev_chunks, mesh, axis, d, n_items, Np, rows_per, user_chunk, k, min_sim_j, slab_dt):
    """Each device accumulates its full (rows_per, Np) S block, then one
    threshold+top-k pass."""
    block_shard = NamedSharding(mesh, P(axis, None))

    def accum_local(S_loc, rel, cols, vals):
        # densify this user chunk on device; padding entries carry OOB rows
        U = jnp.zeros((user_chunk, Np), slab_dt).at[rel, cols].set(vals.astype(slab_dt), mode="drop")
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

    S = jax.device_put(jnp.zeros((Np, Np), dtype=jnp.float32), block_shard)
    for rel, cc, vv in dev_chunks:
        S = accum(S, rel, cc, vv)
        jax.block_until_ready(S)  # keep the remote queue shallow (donated buffer)

    sims, idx = topk(S)
    return NeighborTable(np.asarray(idx)[:n_items], np.asarray(sims)[:n_items])


def _streaming_build(
    dev_chunks, mesh, axis, d, n_items, n_users, user_chunk, k, min_sim_j, slab_dt, sim_block_bytes
):
    """Stream (sub, Np) row blocks per device: accumulate each block fully
    over all user chunks, truncate immediately, never hold more
    (the reference's streaming truncation, item_train.rs:95)."""
    # per-device sub-block rows, bounded by the S budget; every device works
    # on its b-th block simultaneously, so the padded catalog must split as
    # d · n_blocks · sub
    rows_needed = -(-n_items // d)  # ceil rows per device
    Np0 = rows_needed * d
    sub = int(max(sim_block_bytes // (Np0 * 4), 8))
    sub = min(sub, rows_needed)
    n_blocks = -(-rows_needed // sub)
    rows_per = n_blocks * sub
    Np = rows_per * d

    def accum_block(S_blk, rel, cols, vals, blk):
        U = jnp.zeros((user_chunk, Np), slab_dt).at[rel, cols].set(vals.astype(slab_dt), mode="drop")
        shard = jax.lax.axis_index(axis)
        off = shard * rows_per + blk * sub
        Uc = jax.lax.dynamic_slice(U, (0, off), (user_chunk, sub))
        return S_blk + jnp.dot(Uc.T, U, preferred_element_type=jnp.float32)

    accum = jax.jit(
        jax.shard_map(
            accum_block,
            mesh=mesh,
            in_specs=(P(axis, None), P(), P(), P(), P()),
            out_specs=P(axis, None),
            check_vma=False,
        ),
        donate_argnums=(0,),
    )

    def topk_block(S_blk, blk):
        shard = jax.lax.axis_index(axis)
        row_ids = shard * rows_per + blk * sub + jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)[:, 0]
        cols = jax.lax.broadcasted_iota(jnp.int32, S_blk.shape, 1)
        S_blk = jnp.where(
            (cols == row_ids[:, None]) | (cols >= n_items) | (S_blk < min_sim_j), 0.0, S_blk
        )
        sims, idx = jax.lax.top_k(S_blk, k)
        return sims, idx.astype(jnp.int32)

    topk = jax.jit(
        jax.shard_map(
            topk_block,
            mesh=mesh,
            in_specs=(P(axis, None), P()),
            out_specs=(P(axis, None), P(axis, None)),
            check_vma=False,
        ),
        donate_argnums=(0,),
    )

    blk_shard = NamedSharding(mesh, P(axis, None))
    out_idx = np.zeros((n_items, k), dtype=np.int32)
    out_sim = np.zeros((n_items, k), dtype=np.float32)
    for b in range(n_blocks):
        S_blk = jax.device_put(jnp.zeros((d * sub, Np), jnp.float32), blk_shard)
        bj = jnp.int32(b)
        for rel, cc, vv in dev_chunks:
            S_blk = accum(S_blk, rel, cc, vv, bj)
        sims, idx = topk(S_blk, bj)
        jax.block_until_ready(sims)
        sims = np.asarray(sims)
        idx = np.asarray(idx)
        # device s's rows for this block land at global s*rows_per + b*sub
        for s in range(d):
            lo = s * rows_per + b * sub
            hi = min(lo + sub, n_items)
            if hi > lo:
                out_sim[lo:hi] = sims[s * sub : s * sub + (hi - lo)]
                out_idx[lo:hi] = idx[s * sub : s * sub + (hi - lo)]
    return NeighborTable(out_idx, out_sim)
