"""
Sharded ALS training.

The distributed form of the ALS half-epoch (reference parallelism: rayon
par_iter over rows, src/accel/als/explicit.rs:62): row chunks shard over the
``data`` mesh axis (each device solves its rows' normal equations), the
opposite factor table is replicated within the step, and each chunk's
solutions merge with a GSPMD all-gather at the scatter.

Since round 2 the core kernels in :mod:`lkpy_tpu.ops.als` are mesh-aware
(``als_epoch(..., mesh=...)``) and the flagship :class:`ALSTrainerBase`
drives them directly via ``TrainingOptions.mesh``; this module keeps the
standalone sharded half-epoch entry point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lkpy_tpu.ops.als import als_half_epoch
from lkpy_tpu.ops.sparse import PaddedRowMatrix
from lkpy_tpu.parallel.mesh import get_mesh

__all__ = ["sharded_half_epoch"]


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

    Thin wrapper over :func:`lkpy_tpu.ops.als.als_half_epoch` with a mesh;
    ``left``/``right`` are placed replicated, row chunks shard over 'data'.
    """
    mesh = mesh or get_mesh()
    rep = NamedSharding(mesh, P())
    left = jax.device_put(jnp.asarray(left), rep)
    right = jax.device_put(jnp.asarray(right), rep)
    left, _delta = als_half_epoch(buckets, left, right, reg, mode=mode, mesh=mesh)
    return left
