"""
Distribution: device meshes, sharded training, distributed inference.

The TPU-native replacement for the reference's parallelism inventory
(reference: SURVEY.md §2.3 — rayon pools src/accel/parallel.rs, Ray batch
fan-out src/lenskit/batch/_ray.py, ZMQ log relay):

- intra-op row parallelism → XLA intra-chip parallelism + row-sharded factor
  tables over a ``jax.sharding.Mesh``;
- batch-inference fan-out → query batches sharded over the ``data`` axis;
- multi-process coordination → ``jax.distributed`` + XLA collectives over
  ICI (psum for Gram reductions, all_gather for top-k merge, all-to-all for
  sharded embedding lookup).
"""

from lkpy_tpu.parallel.distributed import (
    host_count,
    host_index,
    init_distributed,
    is_coordinator,
    local_device_count,
)
from lkpy_tpu.parallel.mesh import MeshSpec, get_mesh, make_mesh
from lkpy_tpu.parallel.ops import (
    shard_batch,
    shard_replicated,
    shard_rows,
    sharded_topk,
)

__all__ = [
    "MeshSpec",
    "host_count",
    "host_index",
    "init_distributed",
    "is_coordinator",
    "local_device_count",
    "get_mesh",
    "make_mesh",
    "shard_batch",
    "shard_replicated",
    "shard_rows",
    "sharded_topk",
]
