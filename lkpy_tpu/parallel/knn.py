"""
Sharded item-item similarity build.

The distributed form of the kNN similarity pass (reference: rayon item-row
sweep, src/accel/knn/item_train.rs:95): item rows shard over the mesh's
``model`` axis; each device computes the similarity block rows for ITS
items against the full (replicated) normalized matrix on the MXU, then
thresholds and top-k-truncates locally.  Because sharding is by *output*
row, each device's top-k is already global for its rows — no merge
collective is needed; only the result concatenation crosses devices.

This scales the similarity-matrix memory (the single-chip ceiling:
n_items² f32) by the mesh size, e.g. 27k items = 2.9 GB single-chip →
364 MB/device on 8 devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.knn import NeighborTable, _host_densify
from lkpy_tpu.parallel.mesh import get_mesh

__all__ = ["sharded_similarity_topk"]


def sharded_similarity_topk(
    iu_csr: CSR,
    k: int,
    min_sim: float = 1.0e-6,
    *,
    mesh: Mesh | None = None,
    axis: str = "model",
) -> NeighborTable:
    """
    Top-K thresholded cosine similarity with item rows sharded over ``axis``.

    ``iu_csr`` must already be normalized (items × users).  Matches
    :func:`lkpy_tpu.ops.knn.similarity_topk` exactly (exact top-k path).
    """
    mesh = mesh or get_mesh()
    d = mesh.shape[axis]
    n_items, n_users = iu_csr.shape
    k = min(k, max(n_items - 1, 1))
    min_sim_j = jnp.float32(max(min_sim, float(np.finfo(np.float32).smallest_normal)))

    A = _host_densify(iu_csr, 0, n_items)  # (n_items, n_users) f32
    pad = (-n_items) % d
    if pad:
        Ap = np.concatenate([A, np.zeros((pad, n_users), dtype=np.float32)], axis=0)
    else:
        Ap = A
    rows_per = Ap.shape[0] // d

    A_full = jax.device_put(jnp.asarray(A), NamedSharding(mesh, P()))
    A_rows = jax.device_put(jnp.asarray(Ap), NamedSharding(mesh, P(axis, None)))

    def local(rows_block, full):
        # (rows_per, U) @ (U, n_items) — one MXU matmul per device
        S = jnp.dot(rows_block, full.T, preferred_element_type=jnp.float32)
        shard = jax.lax.axis_index(axis)
        row_ids = shard * rows_per + jax.lax.broadcasted_iota(jnp.int32, (rows_per, 1), 0)[:, 0]
        cols = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
        S = jnp.where((cols == row_ids[:, None]) | (S < min_sim_j), 0.0, S)
        sims, idx = jax.lax.top_k(S, k)
        return sims, idx.astype(jnp.int32)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(P(axis, None), P(axis, None)),
        check_vma=False,
    )
    sims, idx = fn(A_rows, A_full)
    return NeighborTable(np.asarray(idx)[:n_items], np.asarray(sims)[:n_items])
