"""
Multi-backend array wrapper (reference: src/lenskit/data/_mtarray.py:26
``MTArray``): hold one logical array, convert lazily between NumPy, JAX,
Torch, and Arrow, caching conversions.
"""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = ["MTArray"]


class MTArray:
    """A lazily-converting multi-backend array."""

    def __init__(self, array: Any):
        self._cache: dict[str, Any] = {}
        kind = self._kind_of(array)
        self._cache[kind] = array
        self._shape = tuple(array.shape) if hasattr(array, "shape") else (len(array),)

    @staticmethod
    def _kind_of(array: Any) -> str:
        mod = type(array).__module__
        if mod.startswith("jax"):
            return "jax"
        if mod.startswith("torch"):
            return "torch"
        if mod.startswith("pyarrow"):
            return "arrow"
        return "numpy"

    @property
    def shape(self) -> tuple[int, ...]:
        return self._shape

    def numpy(self) -> np.ndarray:
        if "numpy" not in self._cache:
            src_kind, src = next(iter(self._cache.items()))
            if src_kind == "arrow":
                self._cache["numpy"] = src.to_numpy(zero_copy_only=False)
            elif src_kind == "torch":
                self._cache["numpy"] = src.detach().cpu().numpy()
            else:
                self._cache["numpy"] = np.asarray(src)
        return self._cache["numpy"]

    def jax(self):
        if "jax" not in self._cache:
            import jax.numpy as jnp

            self._cache["jax"] = jnp.asarray(self.numpy())
        return self._cache["jax"]

    def torch(self):
        if "torch" not in self._cache:
            import torch

            self._cache["torch"] = torch.from_numpy(np.ascontiguousarray(self.numpy()))
        return self._cache["torch"]

    def arrow(self):
        if "arrow" not in self._cache:
            import pyarrow as pa

            self._cache["arrow"] = pa.array(self.numpy())
        return self._cache["arrow"]

    def to(self, format: str):
        return getattr(self, format)()

    def __len__(self) -> int:
        return self._shape[0]
