"""
Batched SPD solves via hand-blocked Cholesky (MXU einsums).

The TPU replacement for the reference's per-row LAPACK ``sposv``
(reference: src/accel/als/solve.rs:47): many small (K, K) SPD systems
solved together, with the O(K³/3) factorization work expressed as batched
panel einsums that XLA maps onto the MXU.  Measured on v5e at
(16384, 64, 64): 20.9 ms vs 42.6 ms for the Pallas Gauss-Jordan kernel and
134 ms for XLA's batched ``cholesky``+``cho_solve`` (rel err 5.6e-7; all
einsums run at ``Precision.HIGHEST`` — default bf16 matmuls cost 1e-3
accuracy, too coarse for ALS normal equations).

Panel width 8: the 8×8 diagonal Cholesky and triangular inverses are
unrolled vector ops over the batch; everything else is (B, m, 8)×(B, 8, 8)
matmuls.  Pure jnp — runs on every backend (CPU tests use the same code).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["blocked_spd_solve", "blocked_cholesky"]

NB = 8
_HI = jax.lax.Precision.HIGHEST


def _chol_small(D: jax.Array) -> jax.Array:
    """Unblocked Cholesky of (B, NB, NB) SPD blocks, vectorized over B."""
    n = D.shape[1]
    L = jnp.zeros_like(D)
    row_idx = jnp.arange(n)
    for j in range(n):
        d = jnp.sqrt(D[:, j, j])
        col = D[:, :, j] / d[:, None]
        col = jnp.where(row_idx[None, :] >= j, col, 0.0)  # rows < j hold garbage
        L = L.at[:, :, j].set(col)
        D = D - col[:, :, None] * col[:, None, :]
    return L


def _inv_lower_small(L: jax.Array) -> jax.Array:
    """Inverse of (B, NB, NB) lower-triangular blocks (forward substitution)."""
    n = L.shape[1]
    inv = jnp.zeros_like(L)
    eye = jnp.eye(n, dtype=L.dtype)
    for j in range(n):
        x = jnp.zeros((L.shape[0], n), L.dtype)
        for i in range(j, n):
            if i > 0:
                s = eye[i, j] - jnp.einsum("bk,bk->b", L[:, i, :i], x[:, :i], precision=_HI)
            else:
                s = jnp.full((L.shape[0],), eye[i, j], L.dtype)
            x = x.at[:, i].set(s / L[:, i, i])
        inv = inv.at[:, :, j].set(x)
    return inv


def blocked_cholesky(A: jax.Array) -> jax.Array:
    """Batched blocked right-looking Cholesky: (B, K, K) SPD → lower L.

    K must be a multiple of NB (callers pad; :func:`blocked_spd_solve` does)."""
    K = A.shape[1]
    L = jnp.zeros_like(A)
    for j in range(0, K, NB):
        D = A[:, j : j + NB, j : j + NB]
        LD = _chol_small(D)
        L = L.at[:, j : j + NB, j : j + NB].set(LD)
        if j + NB < K:
            invLD = _inv_lower_small(LD)
            A21 = A[:, j + NB :, j : j + NB]
            T = jnp.einsum("bmn,bkn->bmk", A21, invLD, precision=_HI)  # A21 · L_D⁻ᵀ
            L = L.at[:, j + NB :, j : j + NB].set(T)
            A = A.at[:, j + NB :, j + NB :].add(-jnp.einsum("bmk,bnk->bmn", T, T, precision=_HI))
    return L


def _tri_solve(L: jax.Array, y: jax.Array, lower: bool) -> jax.Array:
    """Solve L x = y (lower) or Lᵀ x = y for (B, K, K) × (B, K), blocked."""
    K = y.shape[1]
    x = jnp.zeros_like(y)
    order = range(0, K, NB) if lower else range(K - NB, -1, -NB)
    for j in order:
        rhs = y[:, j : j + NB]
        if lower and j > 0:
            rhs = rhs - jnp.einsum("bmn,bn->bm", L[:, j : j + NB, :j], x[:, :j], precision=_HI)
        if not lower and j + NB < K:
            rhs = rhs - jnp.einsum("bnm,bn->bm", L[:, j + NB :, j : j + NB], x[:, j + NB :], precision=_HI)
        invD = _inv_lower_small(L[:, j : j + NB, j : j + NB])
        sub = "bmn,bn->bm" if lower else "bnm,bn->bm"
        x = x.at[:, j : j + NB].set(jnp.einsum(sub, invD, rhs, precision=_HI))
    return x


def blocked_spd_solve(A: jax.Array, y: jax.Array) -> jax.Array:
    """Solve ``A x = y`` for a batch of SPD systems (B, K, K) × (B, K).

    Pads K up to a multiple of NB with an identity block (padded solution
    components are zero and sliced off)."""
    K = y.shape[1]
    pad = (-K) % NB
    if pad:
        B = A.shape[0]
        Ap = jnp.zeros((B, K + pad, K + pad), A.dtype)
        Ap = Ap.at[:, :K, :K].set(A)
        diag = jnp.arange(K, K + pad)
        Ap = Ap.at[:, diag, diag].set(1.0)
        A = Ap
        y = jnp.pad(y, ((0, 0), (0, pad)))
    L = blocked_cholesky(A)
    z = _tri_solve(L, y, lower=True)
    x = _tri_solve(L, z, lower=False)
    return x[:, :K] if pad else x
