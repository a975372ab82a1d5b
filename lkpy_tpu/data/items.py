"""
ItemList: the universal "list of items with attached data" type.

Capability parity with the reference ``ItemList``
(reference: src/lenskit/data/_items.py:46): immutable list of items carrying
IDs and/or numbers (under a vocabulary), optional scores, ranks, and arbitrary
per-item fields; ``top_n`` (reference: _items.py:942), ``isin``, ``remove``,
``to_df``/``from_df``, Arrow round-trip.

TPU-native notes: all payloads are NumPy arrays (host).  Device code never
sees an ItemList — models convert numbers/scores to jnp arrays at their
boundary, keeping this type allocation-light and pickle-friendly.
"""

from __future__ import annotations

from typing import Any, Literal, Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from lkpy_tpu.data.vocab import Vocabulary

__all__ = ["ItemList"]


def _np_field(data) -> np.ndarray:
    if isinstance(data, pa.ChunkedArray):
        data = data.combine_chunks()
    if isinstance(data, pa.Array):
        data = data.to_numpy(zero_copy_only=False)
    if isinstance(data, (pd.Series, pd.Index)):
        data = data.to_numpy()
    try:
        import jax

        if isinstance(data, jax.Array):
            data = np.asarray(data)
    except ImportError:  # pragma: no cover
        pass
    return np.asarray(data)


class ItemList:
    """
    An immutable list of items with optional attached data.

    Args:
        source: another item list to copy/extend.
        item_ids: item IDs.
        item_nums: item numbers (requires ``vocabulary`` to resolve to IDs).
        vocabulary: the item vocabulary.
        ordered: whether this list is a ranking (ordered by preference).
        scores: item scores (float; NaN = unscored).
        fields: additional per-item arrays (e.g. ``rating``, ``timestamp``).
    """

    def __init__(
        self,
        source: "ItemList | None" = None,
        *,
        item_ids=None,
        item_nums=None,
        vocabulary: Vocabulary | None = None,
        ordered: bool | None = None,
        scores=None,
        rank=None,
        **fields,
    ):
        if source is not None:
            self._ids = source._ids
            self._nums = source._nums
            self._vocab = source._vocab
            self._len = source._len
            self.ordered = source.ordered
            self._fields = dict(source._fields)
        else:
            self._ids = None
            self._nums = None
            self._vocab = None
            self._len = None
            self.ordered = False
            self._fields = {}

        if vocabulary is not None:
            self._vocab = vocabulary
        if item_ids is not None:
            ids = _np_field(item_ids)
            if ids.ndim != 1:
                raise TypeError(f"item_ids must be 1-D (got {ids.ndim}-D)")
            if ids.dtype == object:
                ids = ids.astype(str)
            self._ids = ids
            self._len = len(ids)
            # any inherited nums no longer correspond to these ids; the
            # item_nums branch below reassigns when nums are also given
            self._nums = None
        if item_nums is not None:
            nums = _np_field(item_nums)
            if nums.ndim != 1:
                raise TypeError(f"item_nums must be 1-D (got {nums.ndim}-D)")
            if nums.dtype.kind not in "iu":
                raise TypeError(f"item_nums must be integers (got {nums.dtype})")
            nums = nums.astype(np.int32)
            if self._ids is not None and len(nums) != len(self._ids):
                raise ValueError(
                    f"item_ids and item_nums have mismatched sizes ({len(self._ids)} != {len(nums)})"
                )
            self._nums = nums
            self._len = len(nums)
            if item_ids is None and source is None:
                self._ids = None
        if self._ids is None and self._nums is None:
            self._ids = np.array([], dtype=np.int64)
            self._len = 0
        if self._len is None:
            self._len = len(self._ids) if self._ids is not None else len(self._nums)

        if scores is not None:
            if isinstance(scores, str) and scores == "drop":
                self._fields.pop("score", None)
            else:
                self._fields["score"] = _np_field(scores).astype(np.float32)
        if rank is not None:
            self._fields["rank"] = _np_field(rank).astype(np.int32)
            ordered = True if ordered is None else ordered
        if ordered is not None:
            self.ordered = bool(ordered)
        for name, data in fields.items():
            if data is None:
                continue
            arr = _np_field(data)
            self._fields[name] = arr

        for name, arr in self._fields.items():
            if len(arr) != self._len:
                raise ValueError(f"field {name!r} length {len(arr)} != item count {self._len}")

    # ---- constructors ----------------------------------------------------
    @classmethod
    def from_df(cls, df: pd.DataFrame, *, vocabulary: Vocabulary | None = None, keep_user: bool = False) -> "ItemList":
        """Create from a DataFrame with ``item_id`` and optional score/rating columns
        (reference: _items.py:438)."""
        ids = df["item_id"].to_numpy() if "item_id" in df.columns else None
        nums = df["item_num"].to_numpy() if "item_num" in df.columns else None
        fields = {}
        ordered = None
        scores = None
        rank = None
        for col in df.columns:
            if col in ("item_id", "item_num") or (col.startswith("user_") and not keep_user):
                continue
            if col == "score":
                scores = df[col].to_numpy()
            elif col == "rank":
                rank = df[col].to_numpy()
                if rank.dtype.kind == "f" and np.isnan(rank).any():
                    # long frames mixing ordered and unordered lists carry
                    # NaN ranks for the unordered ones — treat as unranked
                    rank = None
                else:
                    ordered = True
            else:
                fields[col] = df[col].to_numpy()
        return cls(
            item_ids=ids, item_nums=nums, vocabulary=vocabulary, scores=scores, rank=rank, ordered=ordered, **fields
        )

    @classmethod
    def from_vocabulary(cls, vocab: Vocabulary) -> "ItemList":
        """All items in a vocabulary, in number order (reference: _items.py:518)."""
        return cls(item_nums=np.arange(len(vocab), dtype=np.int32), vocabulary=vocab)

    @classmethod
    def from_arrow(cls, tbl: pa.Table, *, vocabulary: Vocabulary | None = None) -> "ItemList":
        df = tbl.to_pandas()
        return cls.from_df(df, vocabulary=vocabulary)

    def clone(self) -> "ItemList":
        return ItemList(self)

    # ---- accessors -------------------------------------------------------
    @property
    def vocabulary(self) -> Vocabulary | None:
        return self._vocab

    def __len__(self) -> int:
        return self._len

    def __bool__(self) -> bool:
        return self._len > 0

    def ids(self) -> np.ndarray:
        """Item IDs (resolving through the vocabulary if needed)."""
        if self._ids is None:
            if self._vocab is None:
                raise RuntimeError("item list has no IDs and no vocabulary")
            self._ids = self._vocab.id_array(self._nums)
        return self._ids

    def numbers(
        self,
        format: str = "numpy",
        *,
        vocabulary: Vocabulary | None = None,
        missing: Literal["error", "negative"] = "error",
    ):
        """Item numbers under the (or a provided) vocabulary."""
        vocab = vocabulary if vocabulary is not None else self._vocab
        if vocab is None:
            raise RuntimeError("item list has no vocabulary")
        # an explicitly-passed vocabulary never touches the cache: caching
        # its numbers would serve STALE numbers to a later call with a
        # different vocabulary (found by tests/data/test_itemlist_property.py).
        # A nums-only list with no vocabulary of its own has nothing to remap
        # FROM — its stored numbers are interpreted as already being in the
        # caller's vocabulary (reference: data/_items.py numbers()).
        if (
            vocabulary is not None
            and vocabulary is not self._vocab
            and not (self._vocab is None and self._ids is None)
        ):
            nums = vocab.numbers(self.ids(), missing=missing)
        elif self._nums is None:
            nums = vocab.numbers(self._ids, missing=missing)
            self._nums = nums if missing == "error" else None
        else:
            nums = self._nums
        return self._export(nums, format)

    def scores(self, format: str = "numpy"):
        """Item scores, or None if unscored."""
        s = self._fields.get("score")
        return self._export(s, format) if s is not None else None

    def ranks(self, format: str = "numpy"):
        """1-based ranks if this list is ordered (reference: _items.py:690)."""
        r = self._fields.get("rank")
        if r is None and self.ordered:
            r = np.arange(1, self._len + 1, dtype=np.int32)
        return self._export(r, format) if r is not None else None

    def field(self, name: str, format: str = "numpy"):
        if name == "score":
            return self.scores(format)
        if name == "rank":
            return self.ranks(format)
        f = self._fields.get(name)
        return self._export(f, format) if f is not None else None

    @property
    def field_names(self) -> list[str]:
        return list(self._fields.keys())

    @staticmethod
    def _export(arr, format: str):
        if arr is None or format == "numpy":
            return arr
        if format == "jax":
            import jax.numpy as jnp

            return jnp.asarray(arr)
        if format == "torch":
            import torch

            return torch.from_numpy(np.ascontiguousarray(arr))
        if format == "arrow":
            return pa.array(arr)
        if format == "pandas":
            return pd.Series(arr)
        raise ValueError(f"unknown format {format!r}")

    # ---- set / ranking operations ---------------------------------------
    def isin(self, other: "ItemList") -> np.ndarray:
        """Boolean membership mask of this list's items in ``other`` (reference: _items.py:756)."""
        if self._vocab is not None and other._vocab is not None and self._vocab == other._vocab:
            return np.isin(self.numbers(), other.numbers())
        return np.isin(self.ids(), other.ids())

    def top_n(self, n: int | None = None, *, scores=None) -> "ItemList":
        """
        The top-N items by score, as an ordered (ranked) list
        (reference: _items.py:942).  NaN scores sort last and are dropped.
        """
        if scores is None:
            svals = self.scores()
        elif isinstance(scores, str):
            svals = self.field(scores)
        else:
            svals = _np_field(scores).astype(np.float32)
        if svals is None:
            raise ValueError("top_n requires scores")
        valid = ~np.isnan(svals)
        k = int(np.sum(valid))
        if n is not None:
            k = min(k, n)
        # argsort descending on negated scores; stable for ties
        order = np.argsort(-np.where(valid, svals, -np.inf), kind="stable")[:k]
        out = self._take(order)
        return ItemList(out, ordered=True, rank=np.arange(1, k + 1, dtype=np.int32), scores=svals[order])

    def remove(self, items: "ItemList") -> "ItemList":
        """A copy of this list with the given items removed (reference: _items.py:1072)."""
        mask = ~self.isin(items)
        return self._take(np.nonzero(mask)[0])

    def concat(self, other: "ItemList") -> "ItemList":
        fields = {}
        for name in set(self._fields) | set(other._fields):
            a = self.field(name)
            b = other.field(name)
            if a is None:
                a = np.full(len(self), np.nan)
            if b is None:
                b = np.full(len(other), np.nan)
            fields[name] = np.concatenate([a, b])
        fields.pop("rank", None)
        return ItemList(
            item_ids=np.concatenate([self.ids(), other.ids()]),
            vocabulary=self._vocab,
            **fields,
        )

    def _take(self, idx: np.ndarray, *, ordered: bool | None = None) -> "ItemList":
        fields = {n: v[idx] for n, v in self._fields.items() if n != "rank"}
        scores = fields.pop("score", None)
        il = ItemList(
            item_ids=self._ids[idx] if self._ids is not None else None,
            item_nums=self._nums[idx] if self._nums is not None else None,
            vocabulary=self._vocab,
            scores=scores,
            ordered=self.ordered if ordered is None else ordered,
            **fields,
        )
        return il

    def __getitem__(self, sel) -> "ItemList":
        if isinstance(sel, (int, np.integer)):
            sel = np.asarray([sel])
        elif isinstance(sel, slice):
            sel = np.arange(self._len)[sel]
        else:
            sel = np.asarray(sel)
            if sel.dtype == bool:
                sel = np.nonzero(sel)[0]
        return self._take(sel)

    # ---- export ----------------------------------------------------------
    def to_df(self, *, ids: bool = True, numbers: bool = True) -> pd.DataFrame:
        cols: dict[str, Any] = {}
        if ids and (self._ids is not None or self._vocab is not None):
            cols["item_id"] = self.ids()
        if numbers and (self._nums is not None or self._vocab is not None):
            try:
                cols["item_num"] = self.numbers()
            except (RuntimeError, KeyError):
                pass
        for name in self._fields:
            cols[name] = self.field(name)
        if self.ordered and "rank" not in cols:
            cols["rank"] = self.ranks()
        return pd.DataFrame(cols)

    def to_arrow(self, *, ids: bool = True, numbers: bool = False) -> pa.Table:
        return pa.Table.from_pandas(self.to_df(ids=ids, numbers=numbers), preserve_index=False)

    def __repr__(self) -> str:
        return f"<ItemList of {self._len} items{' (ordered)' if self.ordered else ''}>"

    def __getstate__(self):
        return {
            "ids": self._ids,
            "nums": self._nums,
            "vocab": self._vocab,
            "ordered": self.ordered,
            "fields": self._fields,
        }

    def __setstate__(self, state):
        self._ids = state["ids"]
        self._nums = state["nums"]
        self._vocab = state["vocab"]
        self.ordered = state["ordered"]
        self._fields = state["fields"]
        self._len = len(self._ids) if self._ids is not None else len(self._nums)
