"""
Sharded ALS training.

The distributed form of the ALS half-epoch (reference parallelism: rayon
par_iter over rows, src/accel/als/explicit.rs:62): row buckets shard over
the ``data`` mesh axis (each device solves its rows' normal equations), the
opposite factor table is replicated within the step, and the OtOr Gram
reduction is a psum when the right table is row-sharded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lkpy_tpu.ops.als import solve_explicit_bucket, solve_implicit_bucket, implicit_otor
from lkpy_tpu.ops.sparse import PaddedRowMatrix
from lkpy_tpu.parallel.mesh import get_mesh

__all__ = ["shard_bucket", "sharded_half_epoch"]


def shard_bucket(bucket: PaddedRowMatrix, mesh: Mesh | None = None) -> PaddedRowMatrix:
    """Shard a padded row bucket over the 'data' axis (pad rows to multiple
    of the axis size with masked dummies)."""
    mesh = mesh or get_mesh()
    d = mesh.shape["data"]
    B = bucket.n
    pad = (-B) % d
    cols = bucket.cols
    vals = bucket.values
    mask = bucket.mask
    rows = bucket.rows
    if pad:
        cols = jnp.pad(cols, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        if vals is not None:
            vals = jnp.pad(vals, ((0, pad), (0, 0)))
        rows = jnp.pad(rows, (0, pad))  # dummy rows scatter to row 0 harmlessly? no —
        # dummy rows must not clobber real rows: point them at a sacrificial
        # extra row index equal to shape[0] (dropped by scatter mode="drop")
        rows = rows.at[B:].set(bucket.shape[0])
    shard = NamedSharding(mesh, P("data", None))
    rshard = NamedSharding(mesh, P("data"))
    return PaddedRowMatrix(
        jax.device_put(rows, rshard),
        jax.device_put(cols, shard),
        None if vals is None else jax.device_put(vals, shard),
        jax.device_put(mask, shard),
        bucket.shape,
    )


def sharded_half_epoch(
    buckets: list[PaddedRowMatrix],
    left: jax.Array,
    right: jax.Array,
    reg: float,
    *,
    mode: str,
    mesh: Mesh | None = None,
) -> jax.Array:
    """One sharded ALS half-epoch: each device solves its row shard.

    ``left`` must have one extra sacrificial row (index n) for padded
    dummies; callers slice it off after training.
    """
    mesh = mesh or get_mesh()
    regj = jnp.float32(reg)
    rep = NamedSharding(mesh, P())
    right = jax.device_put(right, rep)
    if mode == "implicit":
        otor = implicit_otor(right, regj)

    for b in buckets:
        sb = shard_bucket(b, mesh)
        if mode == "explicit":
            x = solve_explicit_bucket(sb.cols, sb.values, sb.mask, right, regj)
        else:
            x = solve_implicit_bucket(sb.cols, sb.values, sb.mask, right, otor)
        left = left.at[sb.rows].set(x, mode="drop")
    return left
