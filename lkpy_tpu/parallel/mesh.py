"""
Device mesh management.

Replaces the reference's thread-pool configuration
(reference: src/lenskit/parallel/config.py:34 ``init_threading``) with JAX
device meshes: a ``data`` axis for batch/row parallelism and a ``model``
axis for sharded embedding tables.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["MeshSpec", "make_mesh", "get_mesh"]

_current_mesh: Mesh | None = None


@dataclass
class MeshSpec:
    """Logical mesh shape: data (batch/rows) × model (table shards)."""

    data: int = -1  # -1 = all remaining devices
    model: int = 1

    def resolve(self, n_devices: int | None = None) -> tuple[int, int]:
        n = n_devices if n_devices is not None else len(jax.devices())
        model = max(self.model, 1)
        data = self.data if self.data > 0 else max(n // model, 1)
        if data * model > n:
            raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
        return data, model


def make_mesh(spec: MeshSpec | None = None, *, devices=None) -> Mesh:
    """Create (and set as current) a 2-D ('data', 'model') mesh."""
    global _current_mesh
    spec = spec or MeshSpec()
    devs = devices if devices is not None else jax.devices()
    data, model = spec.resolve(len(devs))
    grid = np.asarray(devs[: data * model]).reshape(data, model)
    _current_mesh = Mesh(grid, ("data", "model"))
    return _current_mesh


def get_mesh() -> Mesh:
    """The current mesh, creating a default single-axis mesh if unset."""
    global _current_mesh
    if _current_mesh is None:
        _current_mesh = make_mesh()
    return _current_mesh
