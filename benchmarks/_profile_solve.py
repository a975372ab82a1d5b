"""Batched SPD solve shootout on TPU: Pallas Gauss-Jordan (current) vs
hand-blocked batched Cholesky (MXU einsums) vs XLA cholesky.

Shapes: (B, 64, 64) SPD systems, B = 16384 (ALS epoch regime).
"""
import sys, time
from functools import partial
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
HI = jax.lax.Precision.HIGHEST

import os
NB = int(os.environ.get('NB', '8'))  # panel width


def _chol_small(D):
    """Unblocked Cholesky of (B, NB, NB) SPD blocks, vectorized over B."""
    B, n, _ = D.shape
    L = jnp.zeros_like(D)
    for j in range(n):
        d = jnp.sqrt(D[:, j, j])
        col = D[:, :, j] / d[:, None]  # (B, n) — rows < j are garbage, masked below
        row_idx = jnp.arange(n)
        col = jnp.where(row_idx[None, :] >= j, col, 0.0)
        L = L.at[:, :, j].set(col)
        D = D - col[:, :, None] * col[:, None, :]
    return L


def _inv_lower_small(L):
    """Inverse of (B, NB, NB) lower-triangular blocks via forward substitution."""
    B, n, _ = L.shape
    inv = jnp.zeros_like(L)
    eye = jnp.eye(n, dtype=L.dtype)
    for j in range(n):
        # solve L x = e_j by forward substitution
        x = jnp.zeros((B, n), L.dtype)
        for i in range(j, n):
            s = eye[i, j] - jnp.einsum("bk,bk->b", L[:, i, :i], x[:, :i], precision=HI) if i > 0 else eye[i, j] + jnp.zeros((B,), L.dtype)
            x = x.at[:, i].set(s / L[:, i, i])
        inv = inv.at[:, :, j].set(x)
    return inv


def blocked_cholesky(A):
    """Batched blocked Cholesky: (B, K, K) SPD -> lower L."""
    B, K, _ = A.shape
    L = jnp.zeros_like(A)
    for j in range(0, K, NB):
        D = A[:, j:j + NB, j:j + NB]
        LD = _chol_small(D)
        L = L.at[:, j:j + NB, j:j + NB].set(LD)
        if j + NB < K:
            invLD = _inv_lower_small(LD)  # (B, NB, NB)
            A21 = A[:, j + NB:, j:j + NB]  # (B, K-j-NB, NB)
            T = jnp.einsum("bmn,bkn->bmk", A21, invLD, precision=HI)  # A21 @ invLD^T
            L = L.at[:, j + NB:, j:j + NB].set(T)
            A = A.at[:, j + NB:, j + NB:].add(-jnp.einsum("bmk,bnk->bmn", T, T, precision=HI))
    return L


def blocked_tri_solve(L, y, lower=True):
    """Solve L x = y (lower) or L^T x = y (upper) for (B,K,K) x (B,K)."""
    B, K = y.shape
    x = jnp.zeros_like(y)
    rng = range(0, K, NB) if lower else range(K - NB, -1, -NB)
    for j in rng:
        rhs = y[:, j:j + NB]
        if lower:
            if j > 0:
                rhs = rhs - jnp.einsum("bmn,bn->bm", L[:, j:j + NB, :j], x[:, :j], precision=HI)
            invD = _inv_lower_small(L[:, j:j + NB, j:j + NB])
            x = x.at[:, j:j + NB].set(jnp.einsum("bmn,bn->bm", invD, rhs, precision=HI))
        else:
            if j + NB < K:
                rhs = rhs - jnp.einsum("bnm,bn->bm", L[:, j + NB:, j:j + NB], x[:, j + NB:], precision=HI)
            invD = _inv_lower_small(L[:, j:j + NB, j:j + NB])
            x = x.at[:, j:j + NB].set(jnp.einsum("bnm,bn->bm", invD, rhs, precision=HI))
    return x


@jax.jit
def solve_blocked(A, y):
    L = blocked_cholesky(A)
    z = blocked_tri_solve(L, y, lower=True)
    return blocked_tri_solve(L, z, lower=False)


@jax.jit
def solve_xla(A, y):
    chol = jnp.linalg.cholesky(A)
    return jax.scipy.linalg.cho_solve((chol, True), y[..., None])[..., 0]


def main():
    from lkpy_tpu.ops.pallas_solve import spd_solve

    rng = np.random.default_rng(0)
    B, K = 16384, 64
    M = rng.standard_normal((B, K, K)).astype(np.float32)
    A = jnp.asarray(M @ np.transpose(M, (0, 2, 1)) + 10 * np.eye(K, dtype=np.float32))
    y = jnp.asarray(rng.standard_normal((B, K)).astype(np.float32))

    # correctness vs numpy on a sample
    want = sys.argv[1:] or ["pallas", "blocked", "xla"]
    fns = {"pallas": jax.jit(spd_solve), "blocked": solve_blocked, "xla": solve_xla}
    ref = np.linalg.solve(np.asarray(A[:64]), np.asarray(y[:64])[..., None])[..., 0]
    for name in want:
        fn = fns[name]
        t0 = time.time()
        x = fn(A, y)
        jax.block_until_ready(x)
        first = time.time() - t0
        err = float(np.abs(np.asarray(x[:64]) - ref).max() / np.abs(ref).max())
        reps = 10
        t0 = time.time()
        for _ in range(reps):
            x = fn(A, y)
        jax.block_until_ready(x)
        dt = (time.time() - t0) / reps
        print(f"{name}: first={first:.1f}s  {dt*1000:.1f} ms  rel_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
