"""
Vocabularies: bidirectional ID ↔ contiguous-index maps.

Capability parity with the reference ``Vocabulary``
(reference: src/lenskit/data/_vocab.py:32), which wraps a Rust hash index
(``_accel.data.IDIndex``).  TPU-native design: the vocabulary is a *sorted*
NumPy array and lookups are vectorized ``searchsorted`` — O(log n) per key,
branch-free, batch-friendly, and directly reusable on-device
(``jnp.searchsorted`` accepts the same table), so ID resolution can run inside
jitted programs when needed.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterable, Iterator, Literal

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["Vocabulary"]


def _as_id_array(keys) -> np.ndarray:
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if isinstance(keys, pa.Array):
        keys = keys.to_numpy(zero_copy_only=False)
    if isinstance(keys, (pd.Index, pd.Series)):
        keys = keys.to_numpy()
    arr = np.asarray(keys)
    if arr.dtype == object:
        # normalize object arrays of strings to str dtype for sortability
        arr = arr.astype(str)
    return arr


class Vocabulary:
    """
    A vocabulary mapping entity IDs to contiguous nonnegative integers.

    Args:
        keys: IDs to place in the vocabulary (ints or strings).
        name: entity-class name (e.g. ``"user"``, ``"item"``).
        reorder: if True (default), sort and deduplicate; if False, preserve
            input order (IDs must already be unique).
    """

    name: str | None

    def __init__(self, keys=None, name: str | None = None, *, reorder: bool = True):
        self.name = name
        if keys is None:
            arr = np.array([], dtype=np.int64)
        else:
            arr = _as_id_array(keys)
        if reorder:
            arr = np.unique(arr)  # sorted + dedup
            self._ids = arr
            self._sorted_ids = arr
            self._order = None  # identity
        else:
            if arr.size != np.unique(arr).size:
                raise ValueError("IDs in a vocabulary must be unique")
            self._ids = arr
            order = np.argsort(arr, kind="stable")
            self._sorted_ids = arr[order]
            self._order = order.astype(np.int64)
        self._hash: str | None = None

    # ---- core lookups ----------------------------------------------------
    @property
    def ids(self) -> np.ndarray:
        """All IDs, in vocabulary order (index i holds the ID of number i)."""
        return self._ids

    @property
    def index(self) -> pd.Index:
        """The vocabulary as a Pandas index (reference: _vocab.py ``index``)."""
        return pd.Index(self._ids, name=self.name)

    @property
    def size(self) -> int:
        return len(self._ids)

    def __len__(self) -> int:
        return len(self._ids)

    def __contains__(self, key: Any) -> bool:
        return self.number(key, missing="negative") >= 0

    def __iter__(self) -> Iterator:
        return iter(self._ids)

    def __eq__(self, other: object) -> bool:
        if self is other:
            return True
        if not isinstance(other, Vocabulary):
            return NotImplemented
        return self.checksum() == other.checksum()

    def __hash__(self) -> int:
        return hash(self.checksum())

    def checksum(self) -> str:
        """Content hash for fast equivalence tests (reference: _vocab.py ``_hash``)."""
        if self._hash is None:
            h = hashlib.sha1()
            h.update(str(self._ids.dtype).encode())
            h.update(np.ascontiguousarray(self._ids).tobytes() if self._ids.dtype != object else str(self._ids.tolist()).encode())
            self._hash = h.hexdigest()
        return self._hash

    def number(self, key: Any, missing: Literal["error", "negative"] = "error") -> int:
        """Look up the number for a single ID."""
        nums = self.numbers(np.asarray([key]), missing="negative")
        n = int(nums[0])
        if n < 0 and missing == "error":
            raise KeyError(f"ID {key!r} not in vocabulary {self.name!r}")
        return n

    def _native_index(self):
        """Lazily-built native hash index for int64 IDs
        (C++ analog of the reference's Rust IDIndex, src/accel/data/index.rs)."""
        if not hasattr(self, "_nat_idx"):
            self._nat_idx = None
            if self._ids.dtype.kind in "iu" and len(self._ids) >= 4096:
                from lkpy_tpu import _native

                if _native.available():
                    try:
                        self._nat_idx = _native.IdIndex(self._ids.astype(np.int64))
                    except (RuntimeError, OverflowError):
                        self._nat_idx = None
        return self._nat_idx

    def numbers(self, keys, missing: Literal["error", "negative"] = "error") -> np.ndarray:
        """
        Vectorized ID → number lookup.

        Returns int32 numbers; missing IDs are −1 (``missing="negative"``) or
        raise ``KeyError``.
        """
        arr = _as_id_array(keys)
        if self._sorted_ids.size == 0:
            nums = np.full(arr.shape, -1, dtype=np.int32)
        elif arr.dtype.kind in "iu" and self._native_index() is not None:
            nums = self._nat_idx.lookup(arr.astype(np.int64))
        else:
            try:
                pos = np.searchsorted(self._sorted_ids, arr)
            except TypeError as e:  # mixed/incomparable types
                raise KeyError(f"IDs not comparable with vocabulary: {e}") from e
            pos = np.clip(pos, 0, self._sorted_ids.size - 1)
            found = self._sorted_ids[pos] == arr
            if self._order is not None:
                nums = np.where(found, self._order[pos], -1).astype(np.int32)
            else:
                nums = np.where(found, pos, -1).astype(np.int32)
        if missing == "error" and np.any(nums < 0):
            bad = arr[nums < 0]
            raise KeyError(f"{bad.size} IDs not in vocabulary {self.name!r} (first: {bad[:5]!r})")
        return nums

    def id(self, num: int):
        """Look up the ID for a number."""
        n = int(num)
        if n < 0 or n >= len(self._ids):
            raise IndexError(f"number {n} out of range for vocabulary of size {len(self._ids)}")
        return self._ids[n]

    def id_array(self, nums=None) -> np.ndarray:
        """Vectorized number → ID lookup (all IDs if ``nums`` is None)."""
        if nums is None:
            return self._ids
        return self._ids[np.asarray(nums)]

    # alias matching reference naming
    def terms(self, nums=None) -> np.ndarray:
        return self.id_array(nums)

    def add_terms(self, keys: Iterable[Any]) -> "Vocabulary":
        """Return a new vocabulary with additional IDs (vocabularies are immutable)."""
        arr = _as_id_array(list(keys))
        fresh = arr[self.numbers(arr, missing="negative") < 0]
        if fresh.size == 0:
            return self
        if self._order is not None:
            merged = np.concatenate([self._ids, np.unique(fresh)])
            return Vocabulary(merged, self.name, reorder=False)
        return Vocabulary(np.concatenate([self._ids, fresh]), self.name)

    def __repr__(self) -> str:
        return f"<Vocabulary {self.name or '?'} [{len(self)} IDs]>"

    def __getstate__(self):
        return {"name": self.name, "ids": self._ids, "order": self._order}

    def __setstate__(self, state):
        self.name = state["name"]
        self._ids = state["ids"]
        self._order = state["order"]
        if self._order is None:
            self._sorted_ids = self._ids
        else:
            self._sorted_ids = self._ids[np.argsort(self._ids, kind="stable")]
        self._hash = None
