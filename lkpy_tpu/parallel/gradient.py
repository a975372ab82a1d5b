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
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "table_rows",
    "leaf_sharding",
    "place_tree",
    "batch_sharding",
    "jit_sharded_step",
    "jit_sharded_epoch",
    "epoch_batch_sharding",
]


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


def epoch_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (n_steps, batch, ...) stacked epoch arrays: steps stay
    whole (the scan axis), each step's batch shards over ``data``."""
    return NamedSharding(mesh, P(None, "data"))


def jit_sharded_epoch(
    step, mesh: Mesh | None, params, opt_state, sharded_rows: set[int], n_const: int = 0
):
    """jit a whole-epoch ``lax.scan`` over ``step``.

    Per-step dispatch dominated gradient-family training on remote
    (tunneled) backends — ~1,700 host round-trips per ML-20M epoch measured
    ~88 ms/step against the device work (VERDICT r4 follow-on to weak #4).
    The epoch becomes ONE program: batches are stacked device arrays
    scanned on the leading axis, the PRNG key is split *inside* the body
    (bit-identical key sequence to the old per-batch Python loop), and the
    mean loss is the only scalar that ever leaves the device.

    ``n_const``: number of leading NON-scanned arrays the step takes after
    the key (graph structure, negative-sampling indices, …).  These MUST be
    arguments, not Python closures — closed-over device arrays embed in the
    program as constants, and the ML-20M LightGCN edge arrays produced a
    168 MB MLIR payload that the compile service rejects.

    Returns ``epoch(params, opt_state, key, *consts, *stacked) ->
    (params, opt_state, next_key, total_loss)`` with params/opt donated;
    ``next_key`` continues the exact sequence for the following epoch.
    """

    def epoch(params, opt_state, key, *args):
        consts = args[:n_const]
        stacked = args[n_const:]

        def body(carry, xs):
            params, opt_state, key, tot = carry
            key, k = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, k, *consts, *xs)
            return (params, opt_state, key, tot + loss), None

        (params, opt_state, key, tot), _ = jax.lax.scan(
            body, (params, opt_state, key, jnp.float32(0.0)), stacked
        )
        return params, opt_state, key, tot

    if mesh is None:
        return jax.jit(epoch, donate_argnums=(0, 1))
    ps = jax.tree.map(lambda l: leaf_sharding(mesh, l, sharded_rows), params)
    os_ = jax.tree.map(lambda l: leaf_sharding(mesh, l, sharded_rows), opt_state)
    # inputs keep their committed shardings (tables via place_tree, stacked
    # batches via epoch_batch_sharding); pin only the OUTPUT shardings so
    # the compiler cannot silently re-replicate the tables across epochs
    return jax.jit(epoch, out_shardings=(ps, os_, None, None), donate_argnums=(0, 1))


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
