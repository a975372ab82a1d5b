"""
Batched small-SPD solve, batch-on-lanes layout (Pallas, TPU).

The round-4 ALS solver (reference: per-row LAPACK ``sposv``,
src/accel/als/solve.rs:47).  The earlier kernels put the k×k matrix on the
(sublane, lane) axes of each tile, which forces one of row/column
extraction per Gauss-Jordan step to cross the LANE dimension — Mosaic
forbids unaligned dynamic lane slicing, so :mod:`lkpy_tpu.ops.pallas_solve`
pays 3 masked full-tile reductions per step (~0.38 M k=64 solves/s) and
the blocked MXU Cholesky (:mod:`lkpy_tpu.ops.solve`) reaches ~0.7 M/s —
round 3 showed those pooled solves were ~half the ALS epoch.

This kernel lays the tableau out as ``(k, kp, B)`` — the BATCH on lanes,
the matrix on (outer, sublane), the rhs folded in as sublane column ``k``.
Elimination is *rank-R blocked* (R=8): each block does its pivot
arithmetic on thin (k, 1, BT)/(R, kp, BT) panels (static indices — the
block loop is unrolled) and then applies ONE rank-8 update to the full
tile, so the 2k³ flops/system run at ~R flops per VMEM-traversal element
instead of 2 — the rank-1 version measured 0.99 M k=64 solves/s
(VMEM-traffic-bound at 64 full-tile read+writes); this one measures
several× that.  No pivoting (SPD contract, as ``sposv``); padded batch
lanes are fully independent (no cross-lane ops anywhere).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spd_solve_lanes", "spd_solve_lanes_chunked"]

_R = 8  # pivot block size (sublane-aligned)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gj_block_kernel(a_ref, y_ref, x_ref, sa_ref, *, k: int):
    """Blocked full-Jordan elimination on the bordered tableau.

    ``sa`` is (k, kp, BT) with kp = k + 8: columns [0, k) hold A, column k
    holds y, columns (k, kp) are zero padding.  After eliminating all k
    pivots, row j is d_j·e_j (plus the transformed rhs in column k), so
    x_j = sa[j, k] / sa[j, j].
    """
    kp = k + _R
    bt = a_ref.shape[2]
    sa_ref[:, :k, :] = a_ref[:]
    sa_ref[:, k : k + 1, :] = y_ref[:].reshape(k, 1, bt)
    if kp > k + 1:
        sa_ref[:, k + 1 :, :] = jnp.zeros((k, kp - k - 1, bt), jnp.float32)

    prows = jax.lax.broadcasted_iota(jnp.int32, (_R, 1, 1), 0)

    for j0 in range(0, k, _R):
        # Right-looking restriction: columns < j0 are already eliminated
        # (or stale-but-never-read-again), so all block arithmetic runs on
        # the live column range [j0, kp) only — half the traffic on average.
        # 1. Jordan-diagonalize the R pivot rows among themselves (thin
        #    (R, kp-j0, BT) ops only).  Afterwards P[r, j0+s] = d̃_r·δ_rs.
        P = sa_ref[j0 : j0 + _R, j0:, :]  # (R, kp-j0, BT)
        C0 = sa_ref[:, j0 : j0 + _R, :]  # (k, R, BT) — pre-block columns
        for r in range(_R):
            d = P[r : r + 1, r : r + 1, :]  # (1, 1, BT)
            fp = jnp.where(prows == r, 0.0, P[:, r : r + 1, :] / d)
            P = P - fp * P[r : r + 1, :, :]
        # 2. Because the finished panel's block columns are DIAGONAL, the
        #    elimination factors for every other row follow from the
        #    pre-block column values alone: f_ir = C0[i, r] / d̃_r.
        dt = jnp.sum(
            P[:, :_R, :] * (prows == jax.lax.broadcasted_iota(jnp.int32, (_R, _R, 1), 1)),
            axis=1,
        )  # (R, BT) = diag d̃
        rdt = 1.0 / dt  # (R, BT) — one reciprocal, reused by all R factors
        # 3. Rank-R update of the trailing columns [j0+R, kp), processed in
        #    R-row strips so each strip's 8-term FMA chain stays in vector
        #    registers instead of materializing full-tile temporaries.
        Pt = P[:, _R:, :]  # (R, kp-j0-R, BT) — trailing part of panel rows
        for i0 in range(0, k, _R):
            if i0 == j0:
                continue  # pivot rows: f = 0, nothing to update
            strip = sa_ref[i0 : i0 + _R, j0 + _R :, :]  # (R, kp-j0-R, BT)
            upd = None
            for r in range(_R):
                rr = jnp.expand_dims(rdt[r : r + 1], 1)  # (1, 1, BT)
                f = C0[i0 : i0 + _R, r : r + 1, :] * rr  # (R, 1, BT)
                term = f * Pt[r : r + 1, :, :]
                upd = term if upd is None else upd + term
            sa_ref[i0 : i0 + _R, j0 + _R :, :] = strip - upd
        # store the diagonalized panel rows (their own update)
        sa_ref[j0 : j0 + _R, j0:, :] = P

    # x_j = sa[j, k] / sa[j, j]
    ri = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 1)
    diag = jnp.sum(jnp.where(ri == ci, sa_ref[:, :k, :], 0.0), axis=1)  # (k, BT)
    x_ref[:] = sa_ref[:, k, :] / diag


@partial(jax.jit, static_argnames=("bt", "interpret"))
def _solve_padded(A, y, *, bt: int, interpret: bool):
    k, _, B = A.shape
    kern = partial(_gj_block_kernel, k=k)
    return pl.pallas_call(
        kern,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((k, k, bt), lambda i: (0, 0, i)),
            pl.BlockSpec((k, bt), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((k, bt), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((k, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, k + _R, bt), jnp.float32)],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * k * k * (k + 1),
            bytes_accessed=B * k * k * 4 + 2 * B * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, y)


@partial(jax.jit, static_argnames=("bt", "interpret"))
def _solve_padded_chunked(A, y, *, bt: int, interpret: bool):
    """Chunked form: A (C, k, k, B), y (C, k, B) → x (C, k, B).

    One grid axis per (chunk, lane-tile) — the scan-chunked ALS buckets feed
    this directly with no reshape/transpose of the (C, k, k, B) stack."""
    C, k, _, B = A.shape
    kern = partial(_gj_block_kernel, k=k)
    return pl.pallas_call(
        kern,
        grid=(C, B // bt),
        in_specs=[
            pl.BlockSpec((None, k, k, bt), lambda c, i: (c, 0, 0, i)),  # None: squeezed
            pl.BlockSpec((None, k, bt), lambda c, i: (c, 0, i)),
        ],
        out_specs=pl.BlockSpec((None, k, bt), lambda c, i: (c, 0, i)),
        out_shape=jax.ShapeDtypeStruct((C, k, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, k + _R, bt), jnp.float32)],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * C * B * k * k * (k + 1),
            bytes_accessed=C * B * k * k * 4 + 2 * C * B * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, y)


def spd_solve_lanes_chunked(A: jax.Array, y: jax.Array, *, bt: int = 128) -> jax.Array:
    """
    Solve scan-chunked batches of small SPD systems in lanes layout.

    Args:
        A: (C, k, k, B) f32 — C chunks of B systems each (``lax.scan``
            stacking order; k a multiple of 8, B a multiple of ``bt``).
        y: (C, k, B) f32 right-hand sides.

    Returns:
        (C, k, B) f32 solutions.
    """
    C, k, _, B = A.shape
    if k % _R:
        raise ValueError(f"k must be a multiple of {_R}, got {k}")
    Bp = -(-max(B, bt) // bt) * bt
    if Bp != B:
        A = jnp.pad(A, ((0, 0), (0, 0), (0, 0), (0, Bp - B)), constant_values=1.0)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, Bp - B)))
    x = _solve_padded_chunked(A, y, bt=bt, interpret=_interpret())
    return x[:, :, :B]


def spd_solve_lanes(A: jax.Array, y: jax.Array, *, bt: int = 128) -> jax.Array:
    """
    Solve a batch of small SPD systems in lanes layout.

    Args:
        A: (k, k, B) f32 SPD matrices — ``A[:, :, b]`` is system b; k must
            be a multiple of 8.
        y: (k, B) f32 right-hand sides.
        bt: batch lanes per grid step (multiple of 128).

    Returns:
        (k, B) f32 solutions.

    Jit-traceable; compiled on TPU, interpreted elsewhere.  B is padded to
    a multiple of ``bt`` internally; singular padded systems produce
    non-finite outputs in their own lanes only (lanes are independent).
    """
    k = A.shape[0]
    if k % _R:
        raise ValueError(f"k must be a multiple of {_R}, got {k}")
    B = A.shape[2]
    Bp = -(-max(B, bt) // bt) * bt
    if Bp != B:
        A = jnp.pad(A, ((0, 0), (0, 0), (0, Bp - B)), constant_values=1.0)
        y = jnp.pad(y, ((0, 0), (0, Bp - B)))
    x = _solve_padded(A, y, bt=bt, interpret=_interpret())
    return x[:, :B]
