"""
SLIM elastic-net training kernels.

TPU-native replacement for the reference's per-column coordinate descent
(reference: src/accel/slim/mod.rs:58,96 — sequential Gauss-Seidel soft
thresholding per column, parallel over columns via rayon).

Design: Gauss-Seidel CD is order-dependent and unvectorizable, so the TPU
kernel solves the *same convex objective* — per target item i,

    min_w  ½‖aᵢ − A w‖² + λ₁‖w‖₁ + ½λ₂‖w‖²   s.t.  w ≥ 0, wᵢ = 0

— with batched FISTA (accelerated proximal gradient), processing blocks of
columns at once.  A is the binary user-item matrix; the SpMM per step runs
as COO segment-sums.  The non-negative soft-threshold prox matches the
reference's thresholding (slim/mod.rs ``soft_thresh``: negative updates clamp
to 0).  Same optimum, different (parallel) path — documented deviation from
the reference's CD iteration order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lkpy_tpu.data.matrix import CSR

__all__ = ["train_slim"]


@partial(jax.jit, static_argnames=("n_users", "n_items", "iters"))
def _slim_block(
    rows: jax.Array,  # (nnz,) user numbers of A
    cols: jax.Array,  # (nnz,) item numbers of A
    col_nnz: jax.Array,  # (n_items,) column counts
    targets: jax.Array,  # (B,) target item numbers for this block
    a_t: jax.Array,  # (n_users, B) dense target columns
    l1: float,
    l2: float,
    step: jax.Array,  # scalar 1/L
    n_users: int,
    n_items: int,
    iters: int,
):
    """FISTA for a block of SLIM columns; returns (n_items, B) weights."""
    B = targets.shape[0]

    def spmm(w):  # A @ w : (n_users, B)
        return jax.ops.segment_sum(w[cols], rows, num_segments=n_users)

    def spmm_t(r):  # Aᵀ @ r : (n_items, B)
        return jax.ops.segment_sum(r[rows], cols, num_segments=n_items)

    self_mask = jnp.arange(n_items, dtype=jnp.int32)[:, None] == targets[None, :]

    def prox(z):
        w = jnp.maximum(z - step * l1, 0.0) / (1.0 + step * l2)
        return jnp.where(self_mask, 0.0, w)

    def body(_, carry):
        w, y, t = carry
        grad = spmm_t(spmm(y) - a_t)
        w_new = prox(y - step * grad)
        t_new = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
        y_new = w_new + ((t - 1.0) / t_new) * (w_new - w)
        return w_new, y_new, t_new

    w0 = jnp.zeros((n_items, B), dtype=jnp.float32)
    w, _, _ = jax.lax.fori_loop(0, iters, body, (w0, w0, jnp.float32(1.0)))
    return w


def _lipschitz(ui: CSR, n_iter: int = 20) -> float:
    """σ_max(A)² via power iteration on AᵀA (host, cheap)."""
    sp = ui.to_scipy(structural=True)
    rng = np.random.default_rng(0)
    v = rng.normal(size=sp.shape[1])
    v /= np.linalg.norm(v)
    s = 1.0
    for _ in range(n_iter):
        u = sp @ v
        v = sp.T @ u
        s = np.linalg.norm(v)
        if s == 0:
            return 1.0
        v /= s
    return float(s)


def train_slim(
    ui: CSR,
    l1: float,
    l2: float,
    max_iters: int = 100,
    block: int = 256,
    *,
    progress=None,
) -> "np.ndarray | CSR":
    """
    Train the full SLIM weight matrix.

    Returns a host CSR with rows = predictor item, cols = target item
    (matching the reference's transposed storage, slim.py:84 ``weights``).
    """
    n_users, n_items = ui.shape
    coo = ui.to_coo()
    rows = jnp.asarray(coo.row)
    cols = jnp.asarray(coo.col)
    col_nnz = jnp.asarray(np.bincount(coo.col, minlength=n_items).astype(np.float32))
    L = _lipschitz(ui)
    step = jnp.float32(1.0 / max(L, 1e-6))

    # dense binary matrix columns for targets built per block
    a_dense_cols = ui.transpose()  # item-major: row j lists users of item j

    out_rows = []
    out_cols = []
    out_vals = []
    for lo in range(0, n_items, block):
        hi = min(lo + block, n_items)
        targets = np.arange(lo, hi, dtype=np.int32)
        a_t = np.zeros((n_users, hi - lo), dtype=np.float32)
        for b, t in enumerate(targets):
            a_t[a_dense_cols.row_cols(int(t)), b] = 1.0
        w = _slim_block(
            rows,
            cols,
            col_nnz,
            jnp.asarray(targets),
            jnp.asarray(a_t),
            float(l1),
            float(l2),
            step,
            n_users,
            n_items,
            int(max_iters),
        )
        w = np.asarray(w)
        nz = np.nonzero(w)
        out_rows.append(nz[0].astype(np.int64))
        out_cols.append(targets[nz[1]].astype(np.int64))
        out_vals.append(w[nz].astype(np.float32))
        if progress is not None:
            progress.update(hi - lo)

    return CSR.from_coo(
        np.concatenate(out_rows),
        np.concatenate(out_cols),
        np.concatenate(out_vals),
        (n_items, n_items),
    )
