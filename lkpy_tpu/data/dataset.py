"""
Dataset: entities, relationships, and interaction matrices.

Capability parity with the reference ``Dataset``
(reference: src/lenskit/data/_dataset.py:63), ``EntitySet``
(data/_entities.py:29), and ``RelationshipSet``/``MatrixRelationshipSet``
(data/_relationships.py:40,410).

TPU-native design: the dataset is a host-side columnar store (NumPy/Pandas/
Parquet).  The interaction matrix is a :class:`~lkpy_tpu.data.matrix.CSR`
that models export to device-friendly padded/bucketed index arrays via
:mod:`lkpy_tpu.ops.sparse` — nothing device-side ever holds raw IDs.
"""

from __future__ import annotations

import json
from os import PathLike
from pathlib import Path
from typing import Literal

import numpy as np
import pandas as pd
import scipy.sparse as sps

from lkpy_tpu.data.items import ItemList
from lkpy_tpu.data.matrix import COO, CSR
from lkpy_tpu.data.schema import AttrLayout, ColumnSpec, DataSchema, EntitySchema, RelationshipSchema, num_col_name
from lkpy_tpu.data.vocab import Vocabulary
from lkpy_tpu.diagnostics import DataError

__all__ = ["Dataset", "EntitySet", "RelationshipSet", "MatrixRelationshipSet"]


class EntityAttribute:
    """
    One attribute column of an entity class — IDs/numbers plus values
    (reference: data/_attributes.py:50).
    """

    def __init__(self, name: str, vocabulary: "Vocabulary", values: pd.Series):
        self.name = name
        self._vocab = vocabulary
        self._values = values

    @property
    def entity_class(self) -> str:
        return self._vocab.name or "entity"

    def ids(self) -> np.ndarray:
        return self._vocab.ids

    def numbers(self) -> np.ndarray:
        return np.arange(len(self._vocab), dtype=np.int32)

    def pandas(self) -> pd.Series:
        return self._values

    def numpy(self) -> np.ndarray:
        return self._values.to_numpy()

    def __len__(self) -> int:
        return len(self._values)

    def __repr__(self) -> str:  # pragma: no cover - debug repr
        return f"<EntityAttribute {self.entity_class}.{self.name} [{len(self)}]>"


class EntitySet:
    """A class of entities with vocabulary and attributes (reference: data/_entities.py:29)."""

    def __init__(self, name: str, vocabulary: Vocabulary, attributes: pd.DataFrame | None = None):
        self.name = name
        self.vocabulary = vocabulary
        # attributes indexed by entity number
        self._attributes = attributes if attributes is not None else pd.DataFrame(index=range(len(vocabulary)))

    @property
    def count(self) -> int:
        return len(self.vocabulary)

    def __len__(self) -> int:
        return len(self.vocabulary)

    def ids(self) -> np.ndarray:
        return self.vocabulary.ids

    def numbers(self) -> np.ndarray:
        return np.arange(len(self.vocabulary), dtype=np.int32)

    @property
    def attribute_names(self) -> list[str]:
        return list(self._attributes.columns)

    def attribute(self, name: str) -> pd.Series:
        if name not in self._attributes.columns:
            from lkpy_tpu.diagnostics import FieldError

            raise FieldError(self.name, name)
        return self._attributes[name]

    def attribute_set(self, name: str) -> EntityAttribute:
        """The attribute as an :class:`EntityAttribute` (IDs + values)."""
        return EntityAttribute(name, self.vocabulary, self.attribute(name))

    def pandas(self) -> pd.DataFrame:
        df = self._attributes.copy()
        df.insert(0, f"{self.name}_id", self.vocabulary.ids)
        return df

    def select(self, *, ids=None, numbers=None) -> "EntitySet":
        if ids is not None:
            numbers = self.vocabulary.numbers(ids)
        numbers = np.asarray(numbers)
        sub_vocab = Vocabulary(self.vocabulary.id_array(numbers), self.name)
        return EntitySet(self.name, sub_vocab, self._attributes.iloc[numbers].reset_index(drop=True))


class RelationshipSet:
    """
    A set of relationship records between entity classes
    (reference: data/_relationships.py:40).

    Stored as a table with ``<alias>_num`` columns plus attribute columns.
    """

    def __init__(
        self,
        dataset: "Dataset",
        name: str,
        schema: RelationshipSchema,
        table: pd.DataFrame,
    ):
        self._ds = dataset
        self.name = name
        self.schema = schema
        self._table = table

    @property
    def is_interaction(self) -> bool:
        return self.schema.interaction

    @property
    def entities(self) -> list[str]:
        return list(self.schema.entities.keys())

    @property
    def attribute_names(self) -> list[str]:
        return list(self.schema.attributes.keys())

    def count(self) -> int:
        return len(self._table)

    def pandas(self, *, attributes=None, ids: bool = False) -> pd.DataFrame:
        df = self._table
        if attributes is not None:
            if isinstance(attributes, str):
                attributes = [attributes]
            cols = [num_col_name(e) for e in self.entities] + list(attributes)
            df = df[cols]
        if ids:
            df = df.copy()
            for alias, cls in self.schema.entity_classes.items():
                vocab = self._ds.entities(cls).vocabulary
                df[f"{alias}_id"] = vocab.id_array(df[num_col_name(alias)].to_numpy())
        return df

    def arrow(self, **kwargs):
        import pyarrow as pa

        return pa.Table.from_pandas(self.pandas(**kwargs), preserve_index=False)

    def matrix(self, *, combine: str | None = None) -> "MatrixRelationshipSet":
        """De-duplicated two-entity matrix view (reference: _relationships.py:305)."""
        if len(self.entities) != 2:
            raise DataError(f"relationship {self.name!r} has {len(self.entities)} entities; matrix needs 2")
        return MatrixRelationshipSet(self._ds, self.name, self.schema, self._table, combine=combine)

    def co_occurrences(
        self, entity: str = "item", *, include_self: bool = False, dense: bool = False
    ):
        """
        Co-occurrence counts of ``entity`` values over the other entity's
        groups (reference: _relationships.py:144-163) — e.g. item×item
        counts of users who interacted with both.

        Returns a scipy COO array, or a dense NumPy matrix with
        ``dense=True``.
        """
        m = self.matrix()
        if entity == m.col_entity:
            sp = m.scipy(None)
        elif entity == m.row_entity:
            sp = m.scipy(None).T.tocsr()
        else:
            raise KeyError(f"relationship has no entity {entity!r}")
        sp = sp.astype(np.float32)
        sp.data[:] = 1.0
        cooc = (sp.T @ sp).tocoo()
        if not include_self:
            keep = cooc.row != cooc.col
            import scipy.sparse as _sps

            cooc = _sps.coo_array(
                (cooc.data[keep], (cooc.row[keep], cooc.col[keep])), shape=cooc.shape
            )
        if dense:
            return np.asarray(cooc.todense())
        return cooc

    def item_lists(self):
        return self.matrix().item_lists()


class MatrixRelationshipSet(RelationshipSet):
    """
    A two-entity relationship materialized as a CSR matrix
    (reference: data/_relationships.py:410).

    Rows are the first entity (usually user), columns the second (item).
    Repeated pairs are combined (count / sum / mean / first / last).
    """

    def __init__(self, dataset, name, schema, table, *, combine: str | None = None):
        row_alias, col_alias = list(schema.entities.keys())
        classes = schema.entity_classes
        self.row_entity = row_alias
        self.col_entity = col_alias
        self.row_vocabulary = dataset.entities(classes[row_alias]).vocabulary
        self.col_vocabulary = dataset.entities(classes[col_alias]).vocabulary

        rows = table[num_col_name(row_alias)].to_numpy()
        cols = table[num_col_name(col_alias)].to_numpy()
        attrs = {
            n: table[n].to_numpy()
            for n in schema.attributes
            if n in table.columns and table[n].dtype.kind in "ifub"
        }
        if schema.repeats and len(table):
            rows, cols, attrs, counts = _combine_repeats(rows, cols, attrs, combine)
            attrs["count"] = counts
        # sort by (row, col) and build CSR
        shape = (len(self.row_vocabulary), len(self.col_vocabulary))
        vals = attrs.get("rating")
        self._csr = CSR.from_coo(rows, cols, vals, shape, fields=attrs)
        # rebuild the deduplicated table in CSR order
        data = {num_col_name(row_alias): self._csr.to_coo().row, num_col_name(col_alias): self._csr.colind}
        for n, v in self._csr.fields.items():
            data[n] = v
        new_schema = schema.model_copy(deep=True)
        new_schema.repeats = False
        for extra in set(attrs) - set(schema.attributes):
            new_schema.attributes[extra] = ColumnSpec(layout=AttrLayout.SCALAR)
        super().__init__(dataset, name, new_schema, pd.DataFrame(data))

    @property
    def n_rows(self) -> int:
        return self._csr.nrows

    @property
    def n_cols(self) -> int:
        return self._csr.ncols

    def matrix(self, *, combine=None) -> "MatrixRelationshipSet":
        return self

    def csr(self, attribute: str | None = "rating") -> CSR:
        """The CSR structure; values are the given attribute (None → structural)."""
        if attribute is None:
            return self._csr.drop_values()
        if attribute == "rating":
            if self._csr.values is None:
                return self._csr
            return self._csr
        f = self._csr.fields.get(attribute)
        if f is None:
            raise KeyError(f"no attribute {attribute!r} on relationship {self.name!r}")
        return self._csr.with_values(f.astype(np.float32))

    def csr_structure(self) -> CSR:
        return self._csr.drop_values()

    def coo_structure(self) -> COO:
        return self._csr.drop_values().to_coo()

    def scipy(
        self,
        attribute: str | None = None,
        *,
        layout: Literal["csr", "coo"] = "csr",
        legacy: bool = False,
    ) -> sps.csr_array | sps.coo_array:
        """SciPy export (reference: _relationships.py:576)."""
        if attribute is None and self._csr.values is not None:
            attribute = "rating"
        if attribute is None or (attribute == "rating" and self._csr.values is None):
            mat = self._csr.to_scipy(structural=True)
        else:
            mat = self.csr(attribute).to_scipy()
        if layout == "coo":
            return mat.tocoo()
        return mat

    def torch(self, attribute: str | None = None):
        import torch

        m = self.scipy(attribute)
        return torch.sparse_csr_tensor(
            torch.from_numpy(m.indptr.astype(np.int64)),
            torch.from_numpy(m.indices.astype(np.int64)),
            torch.from_numpy(m.data),
            size=m.shape,
        )

    def transpose(self) -> CSR:
        return self._csr.transpose()

    # ---- row access ------------------------------------------------------
    def row_items(self, id=None, *, number: int | None = None) -> ItemList | None:
        """One row as an ItemList (reference: _relationships.py:828)."""
        if number is None:
            number = self.row_vocabulary.number(id, missing="negative")
            if number < 0:
                return None
        s, e = self._csr.row_extent(number)
        fields = {n: v[s:e] for n, v in self._csr.fields.items()}
        return ItemList(
            item_nums=self._csr.colind[s:e],
            vocabulary=self.col_vocabulary,
            **fields,
        )

    def item_lists(self):
        from lkpy_tpu.data.collection import ItemListCollection

        ilc = ItemListCollection([f"{self.row_entity}_id"])
        for rn in range(self.n_rows):
            ilc.add(self.row_items(number=rn), self.row_vocabulary.id(rn))
        return ilc

    def to_ilc(self):
        return self.item_lists()

    # ---- stats -----------------------------------------------------------
    def row_stats(self) -> pd.DataFrame:
        return self._axis_stats(self._csr, self.row_vocabulary)

    def col_stats(self) -> pd.DataFrame:
        return self._axis_stats(self._csr.transpose(), self.col_vocabulary)

    @staticmethod
    def _axis_stats(csr: CSR, vocab: Vocabulary) -> pd.DataFrame:
        lens = csr.row_lengths()
        data = {"count": lens}
        if csr.values is not None:
            sums = np.zeros(csr.nrows)
            np.add.at(sums, np.repeat(np.arange(csr.nrows), lens), csr.values)
            with np.errstate(invalid="ignore", divide="ignore"):
                data["rating_count"] = lens
                data["mean_rating"] = np.where(lens > 0, sums / np.maximum(lens, 1), np.nan)
        ts = csr.fields.get("timestamp")
        if ts is not None and csr.nnz:
            first = np.full(csr.nrows, np.nan)
            last = np.full(csr.nrows, np.nan)
            rows = np.repeat(np.arange(csr.nrows), lens)
            np.minimum.at(first := np.full(csr.nrows, np.inf), rows, ts)
            np.maximum.at(last := np.full(csr.nrows, -np.inf), rows, ts)
            data["first_time"] = np.where(lens > 0, first, np.nan)
            data["last_time"] = np.where(lens > 0, last, np.nan)
        return pd.DataFrame(data, index=pd.Index(vocab.ids, name=vocab.name))

    # ---- sampling --------------------------------------------------------
    def sample_negatives(
        self,
        rows: np.ndarray,
        *,
        n: int = 1,
        weighting: Literal["uniform", "popularity"] = "uniform",
        verify: bool = True,
        rng: np.random.Generator | None = None,
        max_attempts: int = 50,
    ) -> np.ndarray:
        """
        Sample negative columns (items) for the given row (user) numbers
        (reference: _relationships.py:725 and src/accel/data/sampling.rs:20).

        Host-side NumPy implementation with verified rejection sampling; the
        device-side jit-compatible variant is
        :func:`lkpy_tpu.ops.sampling.sample_negatives`.
        """
        rng = rng if rng is not None else np.random.default_rng()
        rows = np.asarray(rows, dtype=np.int64)
        shape = (len(rows), n)
        if weighting == "uniform" and verify:
            # native fast path (C++ analog of src/accel/data/sampling.rs)
            from lkpy_tpu import _native

            if _native.available():
                seed = int(rng.integers(0, 2**63 - 1))
                out = _native.sample_negatives(
                    self._csr.rowptr, self._csr.colind, rows, n, self.n_cols, seed, max_attempts
                )
                if out is not None:
                    return out if n > 1 else out[:, 0]
        if weighting == "popularity":
            # sample by interaction popularity: draw random nnz entry
            draw = lambda size: self._csr.colind[rng.integers(0, self._csr.nnz, size=size)].astype(np.int32)
        else:
            draw = lambda size: rng.integers(0, self.n_cols, size=size, dtype=np.int32)
        out = draw(shape)
        if verify:
            for _ in range(max_attempts):
                bad = self._is_positive(rows[:, None], out)
                if not bad.any():
                    break
                redraws = draw(int(bad.sum()))
                out[bad] = redraws
        return out if n > 1 else out[:, 0]

    def _is_positive(self, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
        """Membership test via binary search in sorted CSR rows."""
        rows_b, cols_b = np.broadcast_arrays(rows, cols)
        starts = self._csr.rowptr[rows_b]
        ends = self._csr.rowptr[rows_b + 1]
        pos = starts + _searchsorted_rows(self._csr.colind, starts, ends, cols_b)
        pos_ok = pos < ends
        found = np.zeros(rows_b.shape, dtype=bool)
        found[pos_ok] = self._csr.colind[pos[pos_ok]] == cols_b[pos_ok]
        return found


def _searchsorted_rows(colind, starts, ends, targets):
    """Per-row binary search over CSR column indices (vectorized)."""
    lo = np.zeros_like(starts)
    hi = ends - starts
    while np.any(lo < hi):
        mid = (lo + hi) // 2
        active = lo < hi
        vals = colind[np.minimum(starts + mid, len(colind) - 1)]
        go_right = active & (vals < targets)
        lo = np.where(go_right, mid + 1, lo)
        hi = np.where(active & ~go_right, mid, hi)
    return lo


def _combine_repeats(rows, cols, attrs, combine):
    keys = rows.astype(np.int64) * (np.max(cols) + 1 if len(cols) else 1) + cols
    uniq, inv, counts = np.unique(keys, return_inverse=True, return_counts=True)
    n = len(uniq)
    urows = np.zeros(n, dtype=np.int64)
    ucols = np.zeros(n, dtype=np.int64)
    urows[inv] = rows
    ucols[inv] = cols
    out_attrs = {}
    for name, vals in attrs.items():
        mode = combine
        if mode is None:
            mode = "last" if name == "timestamp" else ("sum" if name == "count" else "mean")
        if mode in ("mean", "sum"):
            acc = np.zeros(n, dtype=np.float64)
            np.add.at(acc, inv, vals.astype(np.float64))
            out = acc / counts if mode == "mean" else acc
        elif mode == "first":
            out = np.full(n, np.nan)
            # reverse so first occurrence wins
            out[inv[::-1]] = vals[::-1]
        else:  # last
            out = np.full(n, np.nan)
            out[inv] = vals
        out_attrs[name] = out.astype(vals.dtype if vals.dtype.kind == "f" else np.float64)
    return urows, ucols, out_attrs, counts.astype(np.int32)


class Dataset:
    """
    The LensKit-style dataset (reference: data/_dataset.py:63).

    Construct with :class:`~lkpy_tpu.data.builder.DatasetBuilder` or
    :func:`~lkpy_tpu.data.adapt.from_interactions_df`.
    """

    def __init__(
        self,
        schema,
        entities: dict[str, EntitySet] | None = None,
        tables: dict[str, pd.DataFrame] | None = None,
    ):
        if callable(schema) and entities is None and tables is None:
            # lazy construction (reference: _dataset.py — ``Dataset(thunk)``):
            # the thunk runs on FIRST data access; until then the instance
            # holds nothing but the deferred loader.  Expensive loads
            # (ML-20M-scale fixtures) cost nothing unless used.
            import threading

            object.__setattr__(self, "_lazy_thunk", schema)
            object.__setattr__(self, "_lazy_lock", threading.Lock())
            return
        if entities is None or tables is None:
            raise TypeError("Dataset needs (schema, entities, tables), or a single loader thunk")
        self.schema = schema
        self._entities = entities
        self._tables = tables
        self._rel_cache: dict[str, RelationshipSet] = {}
        self._matrix_cache: dict[str, MatrixRelationshipSet] = {}

    #: the eager instance's data attributes — ONLY these trigger lazy
    #: materialization.  Anything else (IPython's ``_repr_html_`` probes,
    #: ``hasattr`` duck-typing) raises AttributeError without running the
    #: thunk, preserving the documented "costs nothing unless used".
    _LAZY_DATA_ATTRS = frozenset({"schema", "_entities", "_tables", "_rel_cache", "_matrix_cache"})

    def __getstate__(self):
        # materialize before pickling: the deferred thunk (often a closure)
        # and its lock are not generally picklable, and the receiver wants
        # the data anyway
        if "_lazy_thunk" in self.__dict__:
            self.item_count  # touches schema -> materializes
        return self.__dict__

    def __getattr__(self, name: str):
        # only reached for MISSING attributes — i.e. before a lazy instance
        # materializes (materialized/eager instances have everything in
        # __dict__ and never come through here)
        thunk = self.__dict__.get("_lazy_thunk")
        if thunk is None or name not in Dataset._LAZY_DATA_ATTRS:
            raise AttributeError(name)
        with self.__dict__["_lazy_lock"]:
            if "_lazy_thunk" in self.__dict__:  # not materialized by a racer
                real = thunk()
                if not isinstance(real, Dataset):
                    raise TypeError(f"lazy dataset thunk returned {type(real)}, expected Dataset")
                # update THEN drop the thunk markers — a concurrent reader
                # never observes a half-cleared dict
                self.__dict__.update(real.__dict__)
                del self.__dict__["_lazy_thunk"]
                del self.__dict__["_lazy_lock"]
        return getattr(self, name)

    # ---- identity --------------------------------------------------------
    @property
    def name(self) -> str | None:
        return self.schema.name

    # ---- entities --------------------------------------------------------
    def entities(self, name: str) -> EntitySet:
        if name not in self._entities:
            raise KeyError(f"no entity class {name!r}")
        return self._entities[name]

    @property
    def items(self) -> Vocabulary:
        return self.entities("item").vocabulary

    @property
    def users(self) -> Vocabulary:
        return self.entities("user").vocabulary

    @property
    def item_count(self) -> int:
        return len(self.items)

    @property
    def user_count(self) -> int:
        return len(self.users)

    # ---- relationships ---------------------------------------------------
    def relationships(self, name: str) -> RelationshipSet:
        if name not in self._rel_cache:
            if name not in self.schema.relationships:
                raise KeyError(f"no relationship class {name!r}")
            self._rel_cache[name] = RelationshipSet(
                self, name, self.schema.relationships[name], self._tables[name]
            )
        return self._rel_cache[name]

    @property
    def default_interaction_class(self) -> str:
        if self.schema.default_interaction:
            return self.schema.default_interaction
        inter = [n for n, r in self.schema.relationships.items() if r.interaction]
        if not inter:
            raise DataError("dataset has no interaction relationships")
        return inter[0]

    def interactions(self, name: str | None = None) -> RelationshipSet:
        return self.relationships(name or self.default_interaction_class)

    @property
    def interaction_count(self) -> int:
        return self.interactions().count()

    def interaction_matrix(self, name: str | None = None) -> MatrixRelationshipSet:
        key = name or self.default_interaction_class
        if key not in self._matrix_cache:
            self._matrix_cache[key] = self.relationships(key).matrix()
        return self._matrix_cache[key]

    def interaction_table(
        self, *, format: Literal["pandas", "numpy", "arrow"] = "pandas", ids: bool = False
    ):
        rel = self.interactions()
        df = rel.pandas(ids=ids)
        if format == "pandas":
            return df
        if format == "arrow":
            import pyarrow as pa

            return pa.Table.from_pandas(df, preserve_index=False)
        return {c: df[c].to_numpy() for c in df.columns}

    # ---- convenience -----------------------------------------------------
    def user_row(self, user_id=None, *, user_num: int | None = None) -> ItemList | None:
        """A user's interaction history as an ItemList (reference: _dataset.py:466)."""
        return self.interaction_matrix().row_items(user_id, number=user_num)

    def item_stats(self) -> pd.DataFrame:
        return self.interaction_matrix().col_stats()

    def user_stats(self) -> pd.DataFrame:
        return self.interaction_matrix().row_stats()

    # ---- persistence -----------------------------------------------------
    def save(self, path: str | PathLike):
        """Save as a directory of Parquet tables + schema.json (reference: _container.py:72)."""
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        with open(path / "schema.json", "wt") as f:
            f.write(self.schema.model_dump_json(indent=2))
        for name, es in self._entities.items():
            es.pandas().to_parquet(path / f"{name}.parquet", index=False)
        for name, tbl in self._tables.items():
            tbl.to_parquet(path / f"{name}.parquet", index=False)

    @classmethod
    def load(cls, path: str | PathLike) -> "Dataset":
        path = Path(path)
        with open(path / "schema.json", "rt") as f:
            schema = DataSchema.model_validate_json(f.read())
        entities = {}
        for name in schema.entities:
            df = pd.read_parquet(path / f"{name}.parquet")
            ids = df[f"{name}_id"].to_numpy()
            vocab = Vocabulary(ids, name, reorder=False)
            attrs = df.drop(columns=[f"{name}_id"])
            entities[name] = EntitySet(name, vocab, attrs)
        tables = {}
        for name in schema.relationships:
            tables[name] = pd.read_parquet(path / f"{name}.parquet")
        return cls(schema, entities, tables)

    def __str__(self):
        return f"<Dataset {self.name or '?'} ({self.user_count} users, {self.item_count} items)>"

    __repr__ = __str__


class DataContainer:
    """
    The raw storage form of a dataset — schema plus one table per entity
    class and relationship (reference: data/_container.py:28).  ``Dataset``
    is the indexed view over a container.
    """

    def __init__(self, schema: DataSchema, tables: dict[str, pd.DataFrame]):
        self.schema = schema
        self.tables = tables

    @classmethod
    def from_dataset(cls, ds: Dataset) -> "DataContainer":
        tables = {name: es.pandas() for name, es in ds._entities.items()}
        tables.update(ds._tables)
        return cls(ds.schema, tables)

    def dataset(self) -> Dataset:
        """Index this container into a full :class:`Dataset`."""
        entities = {}
        for name in self.schema.entities:
            df = self.tables[name]
            ids = df[f"{name}_id"].to_numpy()
            vocab = Vocabulary(ids, name, reorder=False)
            entities[name] = EntitySet(name, vocab, df.drop(columns=[f"{name}_id"]))
        rels = {name: self.tables[name] for name in self.schema.relationships}
        return Dataset(self.schema, entities, rels)

    def save(self, path: str | PathLike) -> None:
        """Save as Parquet tables + schema.json (reference: _container.py:72)."""
        self.dataset().save(path)

    @classmethod
    def load(cls, path: str | PathLike) -> "DataContainer":
        return cls.from_dataset(Dataset.load(path))
