"""
Sharding utilities for gradient-family trainers (FlexMF, LightGCN).

The multi-chip training path (SURVEY.md §2.3, BASELINE north star):
embedding/factor tables row-sharded over the ``model`` mesh axis, training
batches sharded over ``data``; XLA/GSPMD inserts the all-gather/all-to-all
for embedding lookups and psum for gradient reduction.  The product
trainers (``lkpy_tpu.models.flexmf``, ``lkpy_tpu.models.lightgcn``) use
these helpers when ``TrainingOptions.mesh`` is set — the reference's torch
training loop (reference: src/lenskit/flexmf/_training.py:39) has no
distribution story; this is the TPU-native replacement for it.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["table_rows", "leaf_sharding", "place_tree", "batch_sharding", "jit_sharded_step"]


def table_rows(n: int, mesh: Mesh | None) -> int:
    """Round a table's row count up to a multiple of the model-axis size so
    rows shard evenly; padding rows are never referenced by real IDs."""
    if mesh is None:
        return n
    m = mesh.shape["model"]
    return -(-n // m) * m


def leaf_sharding(mesh: Mesh, leaf, sharded_rows: set[int]) -> NamedSharding:
    """Sharding for one param/optimizer leaf: tables whose leading dim is a
    (padded) table size are row-sharded over 'model'; everything else
    (scalars, step counts) is replicated."""
    if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] in sharded_rows:
        spec = P("model", *([None] * (leaf.ndim - 1)))
    else:
        spec = P()
    return NamedSharding(mesh, spec)


def place_tree(mesh: Mesh | None, tree, sharded_rows: set[int]):
    """Device-put every leaf of a params/opt-state pytree onto its sharding."""
    if mesh is None:
        return tree
    return jax.tree.map(lambda l: jax.device_put(l, leaf_sharding(mesh, l, sharded_rows)), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def jit_sharded_step(step, mesh: Mesh | None, params, opt_state, n_batch: int, sharded_rows: set[int]):
    """jit a ``step(params, opt_state, key, *batch)`` function, pinning the
    table/optimizer shardings on both sides so the tables stay row-sharded
    across updates (no silent re-replication by the compiler)."""
    if mesh is None:
        return jax.jit(step)
    ps = jax.tree.map(lambda l: leaf_sharding(mesh, l, sharded_rows), params)
    os_ = jax.tree.map(lambda l: leaf_sharding(mesh, l, sharded_rows), opt_state)
    bs = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(ps, os_, None) + (bs,) * n_batch,
        out_shardings=(ps, os_, None),
    )
