"""
Sharding helpers and distributed primitives.

These are the collective patterns the recommender workloads need
(SURVEY.md §2.3): row-sharded factor tables, sharded query batches, and
all-gather top-k merge (the structural analog of a ring collective for
sharded retrieval).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lkpy_tpu.parallel.mesh import get_mesh

__all__ = ["shard_rows", "shard_batch", "shard_replicated", "sharded_topk", "sharded_matmul_topk"]


def shard_rows(arr, mesh: Mesh | None = None, axis: str = "model"):
    """Place an array with its leading dim sharded over the given mesh axis
    (row-sharded factor/embedding tables)."""
    mesh = mesh or get_mesh()
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def shard_batch(arr, mesh: Mesh | None = None, axis: str = "data"):
    """Shard the leading (batch) dimension over the data axis."""
    mesh = mesh or get_mesh()
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def shard_replicated(arr, mesh: Mesh | None = None):
    mesh = mesh or get_mesh()
    return jax.device_put(arr, NamedSharding(mesh, P()))


@partial(jax.jit, static_argnames=("k", "axis_name"))
def _merge_topk(local_vals, local_idx, k: int, axis_name: str):
    # gather per-shard top-k along the last axis and merge
    all_vals = jax.lax.all_gather(local_vals, axis_name, axis=local_vals.ndim - 1, tiled=True)
    all_idx = jax.lax.all_gather(local_idx, axis_name, axis=local_idx.ndim - 1, tiled=True)
    vals, pos = jax.lax.top_k(all_vals, k)
    return vals, jnp.take_along_axis(all_idx, pos, axis=-1)


def sharded_topk(scores, k: int, mesh: Mesh | None = None, axis: str = "model"):
    """
    Top-k over an item axis sharded across the mesh: per-shard top-k then
    all-gather + merge (the sharded-retrieval collective, SURVEY.md §5
    "sharded top-k retrieval").

    ``scores``: (..., n_items) with n_items sharded over ``axis``.
    """
    mesh = mesh or get_mesh()
    n_shards = mesh.shape[axis]
    n_items = scores.shape[-1]
    shard_size = n_items // n_shards

    def local(scores_block):
        vals, idx = jax.lax.top_k(scores_block, k)
        # localize indices to global numbering
        shard_id = jax.lax.axis_index(axis)
        idx = idx + shard_id * shard_size
        return _merge_topk(vals, idx, k, axis)

    in_spec = P(*([None] * (scores.ndim - 1)), axis)
    out_spec = P(*([None] * (scores.ndim - 1)), None)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(in_spec,), out_specs=(out_spec, out_spec), check_vma=False)
    return fn(scores)


def sharded_matmul_topk(queries, table, k: int, mesh: Mesh | None = None):
    """
    Sharded retrieval: scores = queries @ tableᵀ with the table row-sharded
    over 'model'; returns global top-k (values, indices).

    This is the distributed kNN/MF candidate-retrieval primitive: each shard
    computes scores for its item rows (MXU matmul), takes a local top-k, and
    the shards merge with an all-gather.
    """
    mesh = mesh or get_mesh()
    n_shards = mesh.shape["model"]
    n_items = table.shape[0]
    shard_size = n_items // n_shards

    def local(q, tbl):
        scores = jnp.dot(q, tbl.T, preferred_element_type=jnp.float32)
        vals, idx = jax.lax.top_k(scores, k)
        shard_id = jax.lax.axis_index("model")
        idx = idx + shard_id * shard_size
        return _merge_topk(vals, idx, k, "model")

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("model", None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, table)
