"""
Device-side negative sampling.

TPU-native replacement for the reference's Rust rejection sampler
(reference: src/accel/data/sampling.rs:20 ``sample_negatives`` — PCG64 draws
with verification redraw) and ``negative_mask`` (src/accel/data/selection.rs).

Membership tests run as fixed-iteration vectorized binary search over the
device CSR (no data-dependent control flow); redraws are a bounded
``fori_loop`` (reference bounds attempts the same way, sampling.rs:38-50).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["csr_contains", "sample_negatives", "DeviceCSRIndex"]

from typing import NamedTuple


class DeviceCSRIndex(NamedTuple):
    """Device CSR structure for membership tests (column-sorted rows)."""

    rowptr: jax.Array  # (n_rows+1,) int32
    colind: jax.Array  # (nnz,) int32
    n_rows: int
    n_cols: int

    @classmethod
    def from_csr(cls, csr) -> "DeviceCSRIndex":
        return cls(
            jnp.asarray(csr.rowptr, dtype=jnp.int32),
            jnp.asarray(csr.colind, dtype=jnp.int32),
            csr.nrows,
            csr.ncols,
        )


@partial(jax.jit, static_argnames=("n_iter",))
def _csr_contains(rowptr, colind, rows, cols, n_iter: int):
    lo = rowptr[rows]
    hi = rowptr[rows + 1]
    nnz = colind.shape[0]

    def body(_, carry):
        lo, hi = carry
        active = lo < hi
        mid = (lo + hi) // 2
        vals = colind[jnp.minimum(mid, nnz - 1)]
        go_right = active & (vals < cols)
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where(active & ~go_right, mid, hi)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    in_range = lo < rowptr[rows + 1]
    found = in_range & (colind[jnp.minimum(lo, nnz - 1)] == cols)
    return found


def csr_contains(index: DeviceCSRIndex, rows: jax.Array, cols: jax.Array) -> jax.Array:
    """Vectorized membership test: is (row, col) a stored interaction?"""
    n_iter = int(np.ceil(np.log2(max(index.n_cols, 2)))) + 1
    return _csr_contains(index.rowptr, index.colind, rows, cols, n_iter)


@partial(jax.jit, static_argnames=("n", "n_cols", "n_iter", "max_attempts", "weighted"))
def _sample_negatives(
    key,
    rowptr,
    colind,
    rows,  # (B,) int32
    n: int,
    n_cols: int,
    n_iter: int,
    max_attempts: int,
    weighted: bool,
):
    B = rows.shape[0]
    rows_b = jnp.broadcast_to(rows[:, None], (B, n))
    nnz = colind.shape[0]

    def draw(k):
        if weighted:
            # popularity weighting: draw a random interaction's item
            pos = jax.random.randint(k, (B, n), 0, nnz)
            return colind[pos]
        return jax.random.randint(k, (B, n), 0, n_cols, dtype=jnp.int32)

    key, k0 = jax.random.split(key)
    out = draw(k0)

    def body(i, carry):
        out, key = carry
        bad = _csr_contains(rowptr, colind, rows_b, out, n_iter)
        key, k = jax.random.split(key)
        redraw = draw(k)
        out = jnp.where(bad, redraw, out)
        return out, key

    out, _ = jax.lax.fori_loop(0, max_attempts, body, (out, key))
    return out


def sample_negatives(
    key,
    index: DeviceCSRIndex,
    rows: jax.Array,
    *,
    n: int = 1,
    weighting: str = "uniform",
    max_attempts: int = 20,
) -> jax.Array:
    """Sample verified negative columns for the given rows (jit-compatible)."""
    n_iter = int(np.ceil(np.log2(max(index.n_cols, 2)))) + 1
    return _sample_negatives(
        key,
        index.rowptr,
        index.colind,
        rows,
        n,
        index.n_cols,
        n_iter,
        max_attempts,
        weighting == "popularity",
    )
