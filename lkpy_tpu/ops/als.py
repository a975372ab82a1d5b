"""
Batched ALS solve kernels.

The TPU-native replacement for the reference's rayon row-loop ALS kernels
(reference: src/accel/als/explicit.rs:54,81 and src/accel/als/implicit.rs:26;
LAPACK ``sposv`` per row via src/accel/als/solve.rs:47).

Design (ALX-style, cf. PAPERS.md "ALX: Large Scale Matrix Factorization on
TPUs"): rows are bucketed by nnz into power-of-two padded batches
(:func:`lkpy_tpu.ops.sparse.bucket_rows`); each bucket runs one jitted
program that

1. gathers opposite-side factors ``G = right[cols]``  (B, P, k),
2. forms per-row Gram matrices with a masked batched matmul (MXU),
3. factorizes with batched Cholesky and solves (XLA batched linalg),
4. scatters solutions back into the factor table.

Explicit ALS (reference explicit.rs:81):  A = GᵀG + λ·n_u·I,  y = Gᵀ r.
Implicit ALS (reference implicit.rs:26, Hu et al.):
  A = (YᵀY + λI) + Gᵀ diag(c) G,   y = Gᵀ (c + 1),   c = w·r.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.sparse import PaddedRowMatrix, bucket_rows

__all__ = [
    "als_half_epoch",
    "als_epoch",
    "batched_spd_solve",
    "bucket_args",
    "solve_explicit_bucket",
    "solve_implicit_bucket",
    "implicit_otor",
    "solve_row_explicit",
    "solve_row_implicit",
]


@partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(left: jax.Array, rows: jax.Array, vals: jax.Array) -> jax.Array:
    return left.at[rows].set(vals)


def batched_spd_solve(A: jax.Array, y: jax.Array) -> jax.Array:
    """
    Solve ``A x = y`` for a batch of small SPD systems (B, k, k) × (B, k).

    On TPU this dispatches to the Pallas Gauss-Jordan kernel
    (:func:`lkpy_tpu.ops.pallas_solve.spd_solve`): XLA's batched
    ``cholesky``/``cho_solve`` lowers to a sequential blocked factorization
    that measured 145 ms for 16k k=64 systems on v5e (~80% of an ALS epoch);
    the VMEM-resident kernel does the same solves in 43 ms.  Off-TPU the
    LAPACK-backed Cholesky path is fastest (same contract as the reference's
    ``sposv``, src/accel/als/solve.rs:47).
    """
    k = y.shape[1]
    if jax.default_backend() == "tpu" and k <= 256:
        from lkpy_tpu.ops.pallas_solve import spd_solve

        return spd_solve(A, y)
    chol = jnp.linalg.cholesky(A)
    return jax.scipy.linalg.cho_solve((chol, True), y[..., None])[..., 0]


@jax.jit
def solve_explicit_bucket(
    cols: jax.Array,  # (B, P) int32
    vals: jax.Array,  # (B, P) f32 (normalized ratings)
    mask: jax.Array,  # (B, P) bool
    right: jax.Array,  # (n_right, k) f32
    reg: jax.Array,  # scalar f32
) -> jax.Array:
    """One bucket of explicit-ALS row solves; returns (B, k) solutions."""
    G = right[cols]  # (B, P, k) gather
    m = mask.astype(right.dtype)
    Gm = G * m[:, :, None]
    # per-row Gram: (B, k, k) — batched matmul on the MXU
    A = jnp.einsum("bpi,bpj->bij", Gm, G, preferred_element_type=jnp.float32)
    n_u = jnp.sum(m, axis=1)  # (B,)
    k = right.shape[1]
    A = A + (reg * n_u)[:, None, None] * jnp.eye(k, dtype=A.dtype)
    y = jnp.einsum("bpi,bp->bi", Gm, vals, preferred_element_type=jnp.float32)
    return batched_spd_solve(A, y).astype(right.dtype)


@jax.jit
def solve_implicit_bucket(
    cols: jax.Array,  # (B, P) int32
    conf: jax.Array,  # (B, P) f32 — confidence deltas c = w*r (C_u − I)
    mask: jax.Array,  # (B, P) bool
    right: jax.Array,  # (n_right, k)
    otor: jax.Array,  # (k, k) = YᵀY + λI
) -> jax.Array:
    """One bucket of implicit-ALS row solves (Hu et al. confidence weighting)."""
    G = right[cols]
    m = mask.astype(right.dtype)
    cm = conf * m
    A = otor[None, :, :] + jnp.einsum("bpi,bp,bpj->bij", G, cm, G, preferred_element_type=jnp.float32)
    y = jnp.einsum("bpi,bp->bi", G, (conf + 1.0) * m, preferred_element_type=jnp.float32)
    return batched_spd_solve(A, y).astype(right.dtype)


@jax.jit
def implicit_otor(right: jax.Array, reg: jax.Array) -> jax.Array:
    """YᵀY + λI (reference: als/_implicit.py:178 ``_implicit_otor``)."""
    k = right.shape[1]
    return jnp.dot(right.T, right, preferred_element_type=jnp.float32) + reg * jnp.eye(k, dtype=right.dtype)


def bucket_args(buckets: list[PaddedRowMatrix]) -> tuple:
    """Flatten padded buckets into a hashable-treedef pytree for jit args."""
    return tuple((b.rows, b.cols, b.values, b.mask) for b in buckets)


# bound the live (Bc, P, k) gathered-factor tensor to ~1 GB (k=64 f32):
# big buckets are split into sub-batches inside the trace so the fused
# epoch program stays well under HBM even with solver custom-calls that
# XLA cannot rematerialize across
_CHUNK_ENTRIES = 4_000_000


def _half_epoch_body(left, right, reg, buckets, mode: str):
    """Traced half-epoch: every bucket solve + scatter in one program.

    The whole half runs as ONE XLA program — the reference's per-row rayon
    loop (explicit.rs:62) becomes a handful of batched bucket solves fused
    into a single dispatch, which matters doubly here because each dispatch
    to a (possibly remote) TPU costs far more than the compute per bucket.
    """
    otor = implicit_otor(right, reg) if mode == "implicit" else None
    delta_sq = jnp.float32(0.0)
    for rows, cols, vals, mask in buckets:
        B, P = cols.shape
        step = max(8, _CHUNK_ENTRIES // max(P, 1))
        for lo in range(0, B, step):
            hi = min(lo + step, B)
            r, c, m = rows[lo:hi], cols[lo:hi], mask[lo:hi]
            v = None if vals is None else vals[lo:hi]
            if mode == "explicit":
                x = solve_explicit_bucket(c, v, m, right, reg)
            else:
                x = solve_implicit_bucket(c, v, m, right, otor)
            delta_sq = delta_sq + jnp.sum((x - left[r]) ** 2)
            left = left.at[r].set(x)
    return left, delta_sq


@partial(jax.jit, static_argnames=("mode",), donate_argnums=(0,))
def _half_epoch_jit(left, right, reg, buckets, *, mode: str):
    return _half_epoch_body(left, right, reg, buckets, mode)


@partial(jax.jit, static_argnames=("mode",), donate_argnums=(0, 1))
def _epoch_jit(left, right, left_reg, right_reg, left_buckets, right_buckets, *, mode: str):
    left, dl = _half_epoch_body(left, right, left_reg, left_buckets, mode)
    right, dr = _half_epoch_body(right, left, right_reg, right_buckets, mode)
    return left, right, dl, dr


def als_half_epoch(
    buckets: list[PaddedRowMatrix],
    left: jax.Array,
    right: jax.Array,
    reg: float,
    *,
    mode: str,
) -> tuple[jax.Array, float]:
    """
    Solve one side of an ALS iteration.

    Args:
        buckets: padded row buckets of the interaction matrix (values are
            normalized ratings for explicit, confidence deltas for implicit).
        left: (n_left, k) factor table being updated.
        right: (n_right, k) fixed factor table.
        reg: regularization strength.
        mode: "explicit" or "implicit".

    Returns:
        (updated left table, Frobenius norm of the update delta) — the delta
        matches the reference's convergence metric (explicit.rs ``frob``).
    """
    left, delta_sq = _half_epoch_jit(left, jnp.asarray(right), jnp.float32(reg), bucket_args(buckets), mode=mode)
    return left, float(jnp.sqrt(delta_sq))


def als_epoch(
    u_buckets,
    i_buckets,
    u: jax.Array,
    i: jax.Array,
    u_reg: float,
    i_reg: float,
    *,
    mode: str,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """
    One full ALS epoch (user half, then item half) as ONE device program.

    No host synchronization: the returned update deltas are device scalars —
    convert with ``float`` only when a convergence check actually needs them.
    ``u_buckets``/``i_buckets`` may be bucket lists or pre-flattened
    :func:`bucket_args` tuples.
    """
    if u_buckets and isinstance(u_buckets[0], PaddedRowMatrix):
        u_buckets = bucket_args(u_buckets)
    if i_buckets and isinstance(i_buckets[0], PaddedRowMatrix):
        i_buckets = bucket_args(i_buckets)
    u, i, du, di = _epoch_jit(u, i, jnp.float32(u_reg), jnp.float32(i_reg), u_buckets, i_buckets, mode=mode)
    return u, i, jnp.sqrt(du), jnp.sqrt(di)


# ---- single-row (fold-in) solves ------------------------------------------
def solve_row_explicit(item_nums: np.ndarray, ratings: np.ndarray, right: np.ndarray, reg: float) -> np.ndarray:
    """Fold-in solve for one user's normalized ratings
    (reference: als/_explicit.py:121 ``_train_bias_row_cholesky``)."""
    if len(item_nums) == 0:
        return np.zeros(right.shape[1], dtype=np.float32)
    M = right[item_nums]
    A = M.T @ M + np.eye(right.shape[1], dtype=np.float32) * (reg * len(item_nums))
    y = M.T @ ratings.astype(np.float32)
    from scipy.linalg import cho_factor, cho_solve

    return cho_solve(cho_factor(A), y).astype(np.float32)


def solve_row_implicit(item_nums: np.ndarray, conf: np.ndarray, right: np.ndarray, otor: np.ndarray) -> np.ndarray:
    """Fold-in solve for one user's confidence values
    (reference: als/_implicit.py:97 ``_train_new_row``)."""
    if len(item_nums) == 0:
        return np.zeros(right.shape[1], dtype=np.float32)
    M = right[item_nums]
    A = otor + (M.T * conf) @ M
    y = M.T @ (conf + 1.0)
    from scipy.linalg import cho_factor, cho_solve

    return cho_solve(cho_factor(A), y.astype(np.float32)).astype(np.float32)
