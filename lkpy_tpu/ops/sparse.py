"""
Device-side sparse layouts.

The reference streams ragged CSR rows through rayon loops
(reference: src/accel/sparse/csr.rs:36, src/accel/als/explicit.rs:54).  XLA
wants static shapes, so the TPU-native layouts are:

- :class:`DeviceCOO` — flat (row, col, value) int32/float32 arrays, for
  segment-reduction kernels (bias, LightGCN SpMM, gradient scatter).
- :class:`PaddedRowMatrix` — rows padded to a fixed width with a validity
  mask, for batched per-row linear algebra (ALS Cholesky solves, kNN row
  gathers).  ``bucket_rows`` groups rows into power-of-two width buckets so
  padding waste stays bounded while shapes stay static per bucket.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lkpy_tpu.data.matrix import CSR

__all__ = ["DeviceCOO", "PaddedRowMatrix", "pad_rows", "bucket_rows", "round_up"]


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class DeviceCOO(NamedTuple):
    """Flat COO arrays on device (int32 indices, float32 values)."""

    row: jax.Array  # (nnz,) int32
    col: jax.Array  # (nnz,) int32
    values: jax.Array | None  # (nnz,) float32
    shape: tuple[int, int]

    @classmethod
    def from_csr(cls, csr: CSR, field: str | None = "rating") -> "DeviceCOO":
        coo = csr.to_coo()
        if field is None:
            vals = None
        elif field == "rating" or field not in csr.fields:
            vals = coo.values
        else:
            vals = csr.fields[field]
        return cls(
            jnp.asarray(coo.row, dtype=jnp.int32),
            jnp.asarray(coo.col, dtype=jnp.int32),
            None if vals is None else jnp.asarray(vals, dtype=jnp.float32),
            csr.shape,
        )

    @property
    def nnz(self) -> int:
        return self.row.shape[0]


@dataclass(frozen=True)
class PaddedRowMatrix:
    """
    Rows padded to fixed width ``P`` with a validity mask.

    ``cols[i, j]`` is the j-th column index of row ``rows[i]`` (0 where
    padded), ``mask`` marks real entries.  ``rows`` maps padded slots back to
    original row numbers (identity when all rows are present).
    """

    rows: jax.Array  # (B,) int32 original row numbers
    cols: jax.Array  # (B, P) int32
    values: jax.Array | None  # (B, P) float32
    mask: jax.Array  # (B, P) bool
    shape: tuple[int, int]  # original (nrows, ncols)

    @property
    def width(self) -> int:
        return self.cols.shape[1]

    @property
    def n(self) -> int:
        return self.cols.shape[0]


def pad_rows(
    csr: CSR,
    *,
    width: int | None = None,
    align: int = 8,
    rows: np.ndarray | None = None,
    field: str | None = "rating",
) -> PaddedRowMatrix:
    """
    Pad CSR rows into a dense (B, P) layout.

    Args:
        csr: the host CSR matrix.
        width: pad width (default: max row length, rounded up to ``align``).
        rows: specific row numbers to extract (default all).
        field: value field name ("rating" = CSR values; None = structural).
    """
    if rows is None:
        rows = np.arange(csr.nrows, dtype=np.int32)
    rows = np.asarray(rows, dtype=np.int32)
    lens = (csr.rowptr[rows + 1] - csr.rowptr[rows]).astype(np.int64)
    maxlen = int(lens.max()) if len(lens) else 0
    P = width if width is not None else max(round_up(max(maxlen, 1), align), align)
    if maxlen > P:
        raise ValueError(f"row length {maxlen} exceeds pad width {P}")
    B = len(rows)
    cols = np.zeros((B, P), dtype=np.int32)
    mask = np.zeros((B, P), dtype=bool)
    if field is None:
        vsrc = None
    elif field == "rating":
        vsrc = csr.values
    else:
        vsrc = csr.fields.get(field)
    vals = np.zeros((B, P), dtype=np.float32) if vsrc is not None else None
    # vectorized fill via flat scatter
    starts = csr.rowptr[rows]
    idx = np.arange(P)[None, :]
    valid = idx < lens[:, None]
    src = np.minimum(starts[:, None] + idx, csr.nnz - 1 if csr.nnz else 0)
    if csr.nnz:
        cols = np.where(valid, csr.colind[src], 0).astype(np.int32)
        if vals is not None:
            vals = np.where(valid, vsrc[src], 0.0).astype(np.float32)
    mask = valid
    return PaddedRowMatrix(
        jnp.asarray(rows),
        jnp.asarray(cols),
        None if vals is None else jnp.asarray(vals),
        jnp.asarray(mask),
        csr.shape,
    )


_FINE_LADDER_BELOW = 32_768


def _width_ladder(min_width: int, cap: int, ratio: float) -> list[int]:
    """Geometric bucket-width ladder.  ``ratio=2.0`` is the classic
    power-of-two ladder (worst-case occupancy 0.5); ``ratio=1.5`` inserts
    mid widths (worst 0.67, measured combined occupancy 0.73 → ~0.86 on the
    ML-20M bench — capping the fine ladder at 1024 instead lost it back to
    0.756, wide-bucket entries are NOT negligible) at the cost of more
    compiled bucket programs (~2 s load each on remote backends).  Above
    ``_FINE_LADDER_BELOW`` the ladder steps ×2: rows that wide are so few
    that padding there is noise."""
    widths = [min_width]
    while widths[-1] < cap:
        r = ratio if widths[-1] < _FINE_LADDER_BELOW else 2.0
        nxt = int(widths[-1] * r)
        nxt = round_up(nxt, 8 if nxt >= 16 else 4)
        if nxt <= widths[-1]:
            nxt = widths[-1] * 2
        widths.append(nxt)
    return widths


def bucket_rows(
    csr: CSR,
    *,
    min_width: int = 8,
    max_width: int | None = None,
    field: str | None = "rating",
    ratio: float = 2.0,
) -> list[PaddedRowMatrix]:
    """
    Group rows into geometric-width buckets and pad each bucket.

    This is the ragged-row strategy for batched per-row solves (SURVEY.md §7
    "Hard parts"): each bucket has a static shape, so XLA compiles one kernel
    per bucket size; padding waste per bucket is < (1 − 1/ratio).  Rows
    longer than ``max_width`` are truncated to their ``max_width`` first
    entries (callers that must not truncate should pass ``max_width=None``).
    Every padded slot costs a real factor-row gather on the ALS path, so
    ``ratio`` trades gather waste against compiled-program count
    (:func:`_width_ladder`).
    """
    lens = csr.row_lengths()
    nonempty = np.nonzero(lens > 0)[0].astype(np.int32)
    if len(nonempty) == 0:
        return []
    buckets: list[PaddedRowMatrix] = []
    blens = lens[nonempty]
    cap = int(blens.max())
    if max_width is not None:
        cap = min(cap, max_width)
    done = np.zeros(len(nonempty), dtype=bool)
    for width in _width_ladder(min_width, cap, ratio):
        if max_width is not None and width >= max_width:
            sel = ~done
            width = max_width
        else:
            sel = (~done) & (blens <= width)
        rows = nonempty[sel]
        if len(rows):
            if max_width is not None and width == max_width and int(blens[sel].max()) > width:
                buckets.append(_pad_truncate(csr, rows, width, field))
            else:
                buckets.append(pad_rows(csr, width=width, rows=rows, field=field))
            done |= sel
        if done.all():
            break
    return buckets


def _pad_truncate(csr: CSR, rows: np.ndarray, width: int, field: str | None) -> PaddedRowMatrix:
    """Pad rows, truncating over-long rows to their first ``width`` entries."""
    B = len(rows)
    cols = np.zeros((B, width), dtype=np.int32)
    mask = np.zeros((B, width), dtype=bool)
    vsrc = csr.values if field == "rating" else (csr.fields.get(field) if field else None)
    vals = np.zeros((B, width), dtype=np.float32) if vsrc is not None else None
    for b, r in enumerate(rows):
        s, e = csr.row_extent(int(r))
        n = min(e - s, width)
        cols[b, :n] = csr.colind[s : s + n]
        mask[b, :n] = True
        if vals is not None:
            vals[b, :n] = vsrc[s : s + n]
    return PaddedRowMatrix(
        jnp.asarray(rows.astype(np.int32)),
        jnp.asarray(cols),
        None if vals is None else jnp.asarray(vals),
        jnp.asarray(mask),
        csr.shape,
    )
