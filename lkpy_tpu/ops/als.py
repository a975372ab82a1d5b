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

from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.sparse import PaddedRowMatrix, bucket_rows

__all__ = [
    "als_half_epoch",
    "als_epoch",
    "batched_spd_solve",
    "chunk_buckets",
    "ChunkedRows",
    "solve_explicit_bucket",
    "solve_implicit_bucket",
    "implicit_otor",
    "solve_row_explicit",
    "solve_row_implicit",
    "warm_epoch_programs",
]


@partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(left: jax.Array, rows: jax.Array, vals: jax.Array) -> jax.Array:
    return left.at[rows].set(vals)


def batched_spd_solve(A: jax.Array, y: jax.Array) -> jax.Array:
    """
    Solve ``A x = y`` for a batch of small SPD systems (B, k, k) × (B, k).

    On TPU this dispatches to the Pallas Gauss-Jordan kernel
    (:func:`lkpy_tpu.ops.pallas_solve.spd_solve`) — it compiles in seconds,
    which matters because this fused gram+solve program is instantiated once
    per bucket width.  Large buckets bypass this entirely: the epoch path
    routes them through the blocked batched Cholesky
    (:func:`lkpy_tpu.ops.solve.blocked_spd_solve`, 20.9 ms vs 42.6 ms for
    16k k=64 systems on v5e) via ONE shared compiled program
    (:func:`_solve_large_bucket`).  Off-TPU the LAPACK-backed Cholesky path
    is fastest (same contract as the reference's ``sposv``,
    src/accel/als/solve.rs:47).
    """
    k = y.shape[1]
    if jax.default_backend() == "tpu" and k <= 256:
        from lkpy_tpu.ops.pallas_solve import spd_solve

        return spd_solve(A, y)
    chol = jnp.linalg.cholesky(A)
    return jax.scipy.linalg.cho_solve((chol, True), y[..., None])[..., 0]


def _bf16_gram() -> bool:
    """bf16 Gram inputs (f32 MXU accumulation) on TPU — ~1.3× the Gram rate,
    ~7e-4 relative perturbation of the normal equations (measured); the rhs
    ``y`` stays f32.  Opt out with ``LKT_ALS_BF16_GRAM=0``.  Read at trace
    time (per compiled program), not per call."""
    import os

    v = os.environ.get("LKT_ALS_BF16_GRAM")
    if v is not None:
        return v not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def _bf16_table() -> bool:
    """Gather the opposite-side factors from a bf16 copy of the table and
    feed the rhs einsum bf16 inputs (f32 accumulation).  The factor gather
    is the epoch bottleneck (measured ~4.7 ns/row f32 vs ~4.1 bf16 — an
    XLA-gather issue-rate wall, see PARITY.md); this trades ~4e-3 relative
    rhs rounding for ~10% epoch throughput.  End-to-end ML-20M NDCG@10 is
    unchanged (bench.py checks every run).  Opt out with
    ``LKT_ALS_BF16_TABLE=0``; implied off when ``LKT_ALS_BF16_GRAM=0``."""
    import os

    v = os.environ.get("LKT_ALS_BF16_TABLE")
    if v is not None:
        return v not in ("0", "false", "False")
    return _bf16_gram()


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
    if _bf16_gram():
        A = jnp.einsum(
            "bpi,bpj->bij",
            Gm.astype(jnp.bfloat16),
            G.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
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
    if _bf16_gram():
        A = otor[None, :, :] + jnp.einsum(
            "bpi,bp,bpj->bij",
            G.astype(jnp.bfloat16),
            cm.astype(jnp.bfloat16),
            G.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        A = otor[None, :, :] + jnp.einsum("bpi,bp,bpj->bij", G, cm, G, preferred_element_type=jnp.float32)
    y = jnp.einsum("bpi,bp->bi", G, (conf + 1.0) * m, preferred_element_type=jnp.float32)
    return batched_spd_solve(A, y).astype(right.dtype)


@jax.jit
def implicit_otor(right: jax.Array, reg: jax.Array) -> jax.Array:
    """YᵀY + λI (reference: als/_implicit.py:178 ``_implicit_otor``)."""
    k = right.shape[1]
    return jnp.dot(right.T, right, preferred_element_type=jnp.float32) + reg * jnp.eye(k, dtype=right.dtype)


# bound the live (Bc, P, k) gathered-factor tensor to ~1 GB (k=64 f32):
# big buckets are split into fixed-shape chunks scanned with lax.scan so the
# fused epoch program compiles ONE body per bucket width (round-1 unrolled
# chunks made a 860 s cold compile; the scan form is the fix)
_CHUNK_ENTRIES = 4_000_000


class ChunkedRows(NamedTuple):
    """A padded row bucket reshaped into fixed-shape scan chunks.

    ``rows[c, b]`` is the original row number of slot (c, b); padded dummy
    slots carry row number INT32_MAX (out of bounds for any table), so
    scatters with ``mode="drop"`` discard them and validity is
    ``rows < n_rows``.
    """

    rows: jax.Array  # (C, B) int32
    cols: jax.Array  # (C, B, P) int32
    values: jax.Array  # (C, B, P) f32
    mask: jax.Array  # (C, B, P) bool


def chunk_buckets(
    buckets: list[PaddedRowMatrix],
    *,
    mesh=None,
    entries: int = _CHUNK_ENTRIES,
) -> tuple[ChunkedRows, ...]:
    """Reshape padded buckets into fixed-shape scan chunks.

    Each bucket of width P is split into chunks of ``B = entries // P`` rows
    (padded with out-of-bounds dummy rows), giving every chunk of a bucket
    the SAME shape — ``lax.scan`` then compiles one body per bucket width
    instead of one program per (bucket × chunk).

    When ``mesh`` is given, chunk batch dims are sharded over the mesh's
    ``data`` axis (each device solves its row shard; cf. the reference's
    rayon row parallelism, src/accel/als/explicit.rs:62).
    """
    d = 1
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P_

        d = mesh.shape.get("data", 1)
        shard = {
            2: NamedSharding(mesh, P_(None, "data")),
            3: NamedSharding(mesh, P_(None, "data", None)),
        }
    out = []
    for b in buckets:
        Bn, P = b.cols.shape
        step0 = max(entries // max(P, 1), 8 * d)
        # pick the chunk count FIRST, then size chunks to fit exactly: padding
        # is < 8·d rows total, instead of up to a whole near-empty chunk of
        # dummy rows (each dummy row costs a full solve)
        C = max(-(-Bn // step0), 1)
        step = -(-Bn // (C * 8 * d)) * (8 * d)
        pad = C * step - Bn
        rows = jnp.pad(b.rows, (0, pad), constant_values=np.iinfo(np.int32).max)
        cols = jnp.pad(b.cols, ((0, pad), (0, 0)))
        mask = jnp.pad(b.mask, ((0, pad), (0, 0)))
        if b.values is None:
            vals = mask.astype(jnp.float32)
        else:
            vals = jnp.pad(b.values, ((0, pad), (0, 0)))
        C = (Bn + pad) // step
        ch = ChunkedRows(
            rows.reshape(C, step),
            cols.reshape(C, step, P),
            vals.reshape(C, step, P),
            mask.reshape(C, step, P),
        )
        if shard is not None:
            ch = ChunkedRows(
                jax.device_put(ch.rows, shard[2]),
                jax.device_put(ch.cols, shard[3]),
                jax.device_put(ch.values, shard[3]),
                jax.device_put(ch.mask, shard[3]),
            )
        out.append(ch)
    return tuple(out)


def chunk_stats(chunks: tuple["ChunkedRows", ...]) -> dict:
    """Padding-occupancy and flop accounting for a set of chunked buckets.

    ``occupancy`` is real entries / padded entries — every padded entry costs
    a full Gram MAC lane, so (1 − occupancy) is wasted MXU work; dummy rows
    additionally cost whole solves.  Used by bench.py's speed-of-light
    report (VERDICT r2 weak #2)."""
    entries = real = rows = real_rows = 0
    for ch in chunks:
        C, B, P = ch.cols.shape
        entries += C * B * P
        real += int(jnp.sum(ch.mask))
        rows += C * B
        real_rows += int(jnp.sum(ch.rows < jnp.int32(np.iinfo(np.int32).max)))
    return {
        "padded_entries": entries,
        "real_entries": real,
        "occupancy": real / entries if entries else 1.0,
        "padded_rows": rows,
        "real_rows": real_rows,
        "row_occupancy": real_rows / rows if rows else 1.0,
    }


def epoch_flops(u_stats: dict, i_stats: dict, k: int, *, useful: bool) -> float:
    """FLOPs for one implicit-ALS epoch (both halves).

    Gram: 2 MACs = 4 flops per (entry, k, k) lane pair → 2·entries·k² per
    half (einsum bpi,bp,bpj→bij is 2·E·k² multiply-adds = 4·E·k²... counted
    as 2·E·k² MAC-pairs × 2 flops).  Solves: k³/3 per row (Cholesky count;
    the GJ kernel does ~k³ but k³/3 is the standard accounting).  ``useful``
    counts only real entries/rows; padded counts give the machine's actual
    work (the gap is the padding waste)."""
    e_u = u_stats["real_entries" if useful else "padded_entries"]
    e_i = i_stats["real_entries" if useful else "padded_entries"]
    r_u = u_stats["real_rows" if useful else "padded_rows"]
    r_i = i_stats["real_rows" if useful else "padded_rows"]
    gram = 2.0 * (e_u + e_i) * k * k * 2.0
    solves = (r_u + r_i) * (k**3) / 3.0
    return gram + solves


#: total-row threshold above which a half-epoch's solves pool through the
#: shared blocked-Cholesky programs instead of the per-bucket fused Pallas
#: solve (measured on v5e at k=64: blocked 0.61-0.78 M solves/s vs Pallas
#: GJ 0.34)
_BLOCKED_MIN_ROWS = 8_192
#: blocked-solve batch ladder: slices use the largest power-of-two batch
#: ≤ N down to the MIN (32k runs at 0.70 M solves/s vs 16k's 0.60); bounded
#: ladder ⇒ bounded number of ~20 s compiles
_SOLVE_BATCH = 32_768
_SOLVE_BATCH_MIN = 8_192


@jax.jit
def _gram_scan_implicit(cols, conf, mask, right, otor):
    """Per-chunk normal equations only (no solve): returns A (C,B,k,k), y (C,B,k)."""

    def body(_, xs):
        c, v, m = xs
        G = right[c]
        cm = v * m.astype(right.dtype)
        if _bf16_gram():
            A = jnp.einsum(
                "bpi,bp,bpj->bij",
                G.astype(jnp.bfloat16),
                cm.astype(jnp.bfloat16),
                G.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            A = jnp.einsum("bpi,bp,bpj->bij", G, cm, G, preferred_element_type=jnp.float32)
        A = otor[None, :, :] + A
        y = jnp.einsum("bpi,bp->bi", G, (v + 1.0) * m, preferred_element_type=jnp.float32)
        return None, (A, y)

    _, out = jax.lax.scan(body, None, (cols, conf, mask))
    return out


@jax.jit
def _gram_scan_explicit(cols, vals, mask, right, reg):
    def body(_, xs):
        c, v, m = xs
        G = right[c]
        mm = m.astype(right.dtype)
        Gm = G * mm[:, :, None]
        if _bf16_gram():
            A = jnp.einsum(
                "bpi,bpj->bij",
                Gm.astype(jnp.bfloat16),
                G.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            A = jnp.einsum("bpi,bpj->bij", Gm, G, preferred_element_type=jnp.float32)
        n_u = jnp.sum(mm, axis=1)
        k = right.shape[1]
        A = A + (reg * n_u)[:, None, None] * jnp.eye(k, dtype=A.dtype)
        y = jnp.einsum("bpi,bp->bi", Gm, v, preferred_element_type=jnp.float32)
        return None, (A, y)

    _, out = jax.lax.scan(body, None, (cols, vals, mask))
    return out


@jax.jit
def _blocked_solve_slice(A, y):
    """Solve one fixed-shape (sb, k, k) slice — ONE compiled program reused
    for every slice of every large bucket regardless of bucket row count
    (the slicing happens eagerly in the caller, so this never specializes on
    the full flattened shape)."""
    from lkpy_tpu.ops.solve import blocked_spd_solve

    return blocked_spd_solve(A, y)


def _solve_rows_blocked(A_flat, y_flat, serialize: bool = False):
    """Solve N stacked systems via the shared blocked-Cholesky program.

    ``A_flat`` (N, k, k) / ``y_flat`` (N, k) are processed in fixed-size
    slices from a power-of-two ladder (largest ladder entry ≤ N); the final
    slice starts at ``N - sb`` (overlap recompute instead of padding —
    identical results, no wasted dummy solves).  The blocked-Cholesky
    program unrolls 8 panel steps and costs ~20 s to compile, so at most
    ``len(ladder)`` programs exist and each is reused across slices and
    epochs — that is the point of this detour.
    """
    N, k = y_flat.shape
    sb = _SOLVE_BATCH
    while sb > N and sb > _SOLVE_BATCH_MIN:
        sb //= 2
    sb = min(sb, N)
    chunks = []
    offs = list(range(0, N - sb + 1, sb))
    if offs[-1] + sb < N:
        offs.append(N - sb)
    for off in offs:
        x = _blocked_solve_slice(A_flat[off : off + sb], y_flat[off : off + sb])
        if serialize:
            jax.block_until_ready(x)
        chunks.append(x)
    covered = offs[-2] + sb if len(offs) > 1 else 0
    tail = N - covered  # rows of the last (overlapping) slice that are new
    return jnp.concatenate(chunks[:-1] + [chunks[-1][sb - tail :]], axis=0) if len(offs) > 1 else chunks[0][:N]


def _solve_large_bucket(A, y):
    """Solve one bucket's (C, B, k, k) stacked systems (see _solve_rows_blocked)."""
    C, B, k = y.shape
    return _solve_rows_blocked(A.reshape(C * B, k, k), y.reshape(C * B, k)).reshape(C, B, k)


def _pad_k_lanes(A, y):
    """Pad lanes-layout normal equations (C, k, k, B)/(C, k, B) so k is a
    multiple of 8 (GJ panel width); padded dims solve an identity block."""
    k = A.shape[1]
    p = (-k) % 8
    if not p:
        return A, y, k
    A = jnp.pad(A, ((0, 0), (0, p), (0, p), (0, 0)))
    eye_pad = jnp.concatenate([jnp.zeros((k,), jnp.float32), jnp.ones((p,), jnp.float32)])
    A = A + (jnp.diag(eye_pad))[None, :, :, None]
    y = jnp.pad(y, ((0, 0), (0, p), (0, 0)))
    return A, y, k


def _scan_solve_implicit(cols, conf, mask, right, otor):
    """One bucket, fully fused: scan gather+Gram+y (lanes layout) → blocked
    Gauss-Jordan solve (:func:`lkpy_tpu.ops.pallas_gj.spd_solve_lanes_chunked`,
    4.3 M k=64 solves/s vs 0.7 for the pooled blocked Cholesky) → (C, B, k)
    solutions.  The normal equations never cross a program boundary and the
    solve programs of rounds 2–3 disappear (cold-start win).  The ``ijb``
    einsum output is measured free vs ``bij``."""
    from lkpy_tpu.ops.pallas_gj import spd_solve_lanes_chunked

    bf_tab = _bf16_gram() and _bf16_table()
    tab = right.astype(jnp.bfloat16) if bf_tab else right

    def body(_, xs):
        c, v, m = xs
        G = tab[c]
        cm = v * m
        if _bf16_gram():
            Gb = G if bf_tab else G.astype(jnp.bfloat16)
            A = jnp.einsum(
                "bpi,bp,bpj->ijb",
                Gb,
                cm.astype(jnp.bfloat16),
                Gb,
                preferred_element_type=jnp.float32,
            )
        else:
            # explicit HIGHEST: plain f32 einsums still downcast to bf16 on
            # the TPU MXU by default — opting out of bf16 must mean f32
            A = jnp.einsum(
                "bpi,bp,bpj->ijb", G, cm, G,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        yv = ((v + 1.0) * m).astype(G.dtype)
        y = jnp.einsum("bpi,bp->ib", G, yv, preferred_element_type=jnp.float32)
        return None, (A + otor[:, :, None], y)

    _, (A, y) = jax.lax.scan(body, None, (cols, conf, mask))
    A, y, k = _pad_k_lanes(A, y)
    x = spd_solve_lanes_chunked(A, y)  # (C, kp, B)
    return x[:, :k, :].transpose(0, 2, 1)  # (C, B, k)


def _scan_solve_explicit(cols, vals, mask, right, reg):
    from lkpy_tpu.ops.pallas_gj import spd_solve_lanes_chunked

    k_ = right.shape[1]
    eye = jnp.eye(k_, dtype=jnp.float32)
    bf_tab = _bf16_gram() and _bf16_table()
    tab = right.astype(jnp.bfloat16) if bf_tab else right

    def body(_, xs):
        c, v, m = xs
        G = tab[c]
        mm = m.astype(jnp.float32)
        if _bf16_gram():
            Gb = G if bf_tab else G.astype(jnp.bfloat16)
            Gmb = Gb * mm.astype(jnp.bfloat16)[:, :, None]
            A = jnp.einsum(
                "bpi,bpj->ijb", Gmb, Gb, preferred_element_type=jnp.float32
            )
            if bf_tab:
                y = jnp.einsum(
                    "bpi,bp->ib", Gmb, v.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            else:
                y = jnp.einsum(
                    "bpi,bp->ib", G * mm[:, :, None], v,
                    preferred_element_type=jnp.float32,
                )
        else:
            Gm = G * mm[:, :, None]
            A = jnp.einsum(
                "bpi,bpj->ijb", Gm, G,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            y = jnp.einsum("bpi,bp->ib", Gm, v, preferred_element_type=jnp.float32)
        n_u = jnp.sum(mm, axis=1)  # (B,)
        A = A + eye[:, :, None] * (reg * n_u)[None, None, :]
        return None, (A, y)

    _, (A, y) = jax.lax.scan(body, None, (cols, vals, mask))
    A, y, k = _pad_k_lanes(A, y)
    x = spd_solve_lanes_chunked(A, y)
    return x[:, :k, :].transpose(0, 2, 1)


def _apply_body(left, rows, xs, dsq):
    """Scatter one bucket's stacked solutions into the table + delta
    (inline form of :func:`_apply_update_fn`'s body — see there for the
    dummy-row masking rationale)."""
    n_rows = left.shape[0]
    rows = rows.reshape(-1)
    x = xs.reshape(-1, xs.shape[-1])
    valid = (rows < n_rows)[:, None]
    x = jnp.where(valid, x, 0.0)
    dsq = dsq + jnp.sum(jnp.square(jnp.where(valid, x - left[rows], 0.0)))
    left = left.at[rows].set(x, mode="drop")
    return left, dsq


@partial(jax.jit, donate_argnums=(0,))
def _fused_bucket_implicit(left, dsq, rows, cols, conf, mask, right, otor):
    """One bucket end-to-end in ONE program: gather→Gram→GJ-solve→scatter.

    Folding the scatter in (vs a separate apply program per bucket) halves
    the program count — on remote (tunneled) backends each program LOAD
    costs seconds, and round 3 measured the cache-warm cold start as almost
    entirely program loads (VERDICT r3 weak #5)."""
    xs = _scan_solve_implicit(cols, conf, mask, right, otor)
    return _apply_body(left, rows, xs, dsq)


@partial(jax.jit, donate_argnums=(0,))
def _fused_bucket_explicit(left, dsq, rows, cols, vals, mask, right, reg):
    xs = _scan_solve_explicit(cols, vals, mask, right, reg)
    return _apply_body(left, rows, xs, dsq)


@jax.jit
def _solve_scan_implicit(cols, conf, mask, right, otor):
    """Scan one bucket's fixed-shape chunks; returns stacked solutions.

    The body does NOT carry the output table: solves depend only on
    ``right``, so the solutions stack and scatter once per bucket
    (:func:`_apply_update`).  Carry-free scans compile an order of magnitude
    faster than table-carrying ones (no donated-buffer aliasing through the
    loop) at identical runtime — measured on v5e."""

    def body(_, xs):
        c, v, m = xs
        return None, solve_implicit_bucket(c, v, m, right, otor)

    _, out = jax.lax.scan(body, None, (cols, conf, mask))
    return out


@jax.jit
def _solve_scan_explicit(cols, vals, mask, right, reg):
    def body(_, xs):
        c, v, m = xs
        return None, solve_explicit_bucket(c, v, m, right, reg)

    _, out = jax.lax.scan(body, None, (cols, vals, mask))
    return out


@lru_cache(maxsize=None)
def _apply_update_fn(mesh):
    rep = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P_

        rep = NamedSharding(mesh, P_())

    @partial(jax.jit, donate_argnums=(0,))
    def apply_update(left, rows, xs, dsq):
        """Scatter one bucket's stacked solutions into the table + delta.

        Dummy (padded) rows solved a meaningless system — zero them before
        they can poison the table or the delta."""
        n_rows = left.shape[0]
        rows = rows.reshape(-1)
        x = xs.reshape(-1, xs.shape[-1])
        valid = (rows < n_rows)[:, None]
        # dummy rows may have solved to NaN/Inf — mask BEFORE any arithmetic
        x = jnp.where(valid, x, 0.0)
        dsq = dsq + jnp.sum(jnp.square(jnp.where(valid, x - left[rows], 0.0)))
        left = left.at[rows].set(x, mode="drop")
        if rep is not None:
            left = jax.lax.with_sharding_constraint(left, rep)
        return left, dsq

    return apply_update


def warm_epoch_programs(
    u_chunks, i_chunks, n_users: int, n_items: int, k: int, mode: str, mesh=None, timings=None
):
    """Prime every per-bucket epoch program with a serialized dummy run.

    The first call of each program compiles it AND loads it onto the device;
    on remote (tunneled) backends those first calls must be SERIAL and
    host-synchronized — measured on a remote v5e, the cold ML-20M epoch runs
    in ~84 s this way, where enqueueing the same first calls asynchronously
    (the normal epoch path) took 400–1050 s, and calling AOT-compiled
    executables was no better.  Subsequent epochs then run fully async at
    steady-state speed.  Costs one epoch of throwaway device work.

    ``timings``: optional list — appends one ``(label, seconds)`` entry per
    primed program so callers (bench.py) can report the per-program
    compile+load latency table that dominates cold start on tunneled
    backends (VERDICT r3 weak #5).
    """
    for chunks, n_left, n_right in ((u_chunks, n_users, n_items), (i_chunks, n_items, n_users)):
        # identity-ish dummy right table keeps the dummy normal equations
        # non-singular; serialize=True walks the EXACT run path, blocking
        # after every program so compiles+loads happen one at a time
        right = jnp.ones((n_right, k), jnp.float32) * 0.01
        left = jnp.zeros((n_left, k), jnp.float32)
        out = _run_half(
            left, right, jnp.float32(0.1), chunks, mode, mesh, serialize=True, prog_times=timings
        )
        jax.block_until_ready(out)


def _run_half(left, right, reg, chunks, mode: str, mesh, serialize: bool = False, prog_times=None):
    """One half-epoch as a pipeline of per-bucket programs.

    Deliberately NOT one fused epoch program: per-bucket programs each
    compile in seconds where a fused whole-epoch program took 841 s (XLA
    compile passes scale superlinearly in program size).  All calls enqueue
    asynchronously; nothing here blocks on the device, the delta stays a
    device scalar.

    On single-device TPU each bucket is ONE end-to-end program —
    gather→Gram→lanes-GJ solve→scatter (:func:`_fused_bucket_implicit`);
    CPU and mesh runs use the per-bucket scan+solve path below (the round-3
    pooled blocked-Cholesky helpers remain for their tests and for
    :func:`batched_spd_solve` callers).

    ``serialize`` blocks after every program call — used by
    :func:`warm_epoch_programs` so priming walks the EXACT run path;
    ``prog_times`` collects per-program (label, seconds) for the bench's
    cold-start table.
    """
    apply_update = _apply_update_fn(mesh)
    otor = implicit_otor(right, reg) if mode == "implicit" else None
    on_tpu = jax.default_backend() == "tpu"
    dsq = jnp.float32(0.0)

    def _sync(x):
        if serialize:
            jax.block_until_ready(x)
        return x

    if on_tpu and mesh is None:
        # round-4 path: ONE program per bucket, end-to-end — gather→Gram→
        # lanes-GJ solve (4.3 M k=64 solves/s vs 0.7 for the round-3 pooled
        # blocked Cholesky) →scatter.  Program count = bucket count; the
        # round-3 solve and apply programs disappear (cold-start win).
        import time as _time

        for ch in chunks:
            t0 = _time.perf_counter() if prog_times is not None else 0.0
            if mode == "explicit":
                left, dsq = _fused_bucket_explicit(
                    left, dsq, ch.rows, ch.cols, ch.values, ch.mask, right, reg
                )
            else:
                left, dsq = _fused_bucket_implicit(
                    left, dsq, ch.rows, ch.cols, ch.values, ch.mask, right, otor
                )
            _sync(dsq)
            if prog_times is not None:
                prog_times.append((f"{mode}:{ch.cols.shape}", _time.perf_counter() - t0))
        return left, dsq

    for ch in chunks:
        if mode == "explicit":
            xs = _solve_scan_explicit(ch.cols, ch.values, ch.mask, right, reg)
        else:
            xs = _solve_scan_implicit(ch.cols, ch.values, ch.mask, right, otor)
        _sync(xs)
        left, dsq = apply_update(left, ch.rows, xs, dsq)
        _sync(dsq)
    return left, dsq


def _as_chunks(buckets, mesh):
    if buckets and isinstance(buckets[0], PaddedRowMatrix):
        return chunk_buckets(buckets, mesh=mesh)
    return tuple(buckets)


def als_half_epoch(
    buckets,
    left: jax.Array,
    right: jax.Array,
    reg: float,
    *,
    mode: str,
    mesh=None,
) -> tuple[jax.Array, float]:
    """
    Solve one side of an ALS iteration.

    Args:
        buckets: padded row buckets (or pre-built :func:`chunk_buckets`
            output) of the interaction matrix (values are normalized ratings
            for explicit, confidence deltas for implicit).
        left: (n_left, k) factor table being updated.
        right: (n_right, k) fixed factor table.
        reg: regularization strength.
        mode: "explicit" or "implicit".
        mesh: optional device mesh; row chunks shard over its ``data`` axis.

    Returns:
        (updated left table, Frobenius norm of the update delta) — the delta
        matches the reference's convergence metric (explicit.rs ``frob``).
    """
    chunks = _as_chunks(buckets, mesh)
    left, delta_sq = _run_half(left, jnp.asarray(right), jnp.float32(reg), chunks, mode, mesh)
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
    mesh=None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """
    One full ALS epoch (user half, then item half), fully async.

    Each bucket runs as its own small program (see :func:`_run_half` for why
    that beats one fused epoch program on both compile time and throughput).
    No host synchronization: the returned update deltas are device scalars —
    convert with ``float`` only when a convergence check actually needs them.
    ``u_buckets``/``i_buckets`` may be bucket lists or pre-built
    :func:`chunk_buckets` tuples (pass the latter to avoid re-chunking every
    epoch).  With ``mesh``, row batches shard over the ``data`` axis and the
    factor tables stay replicated (GSPMD all-gathers each chunk's solutions).
    """
    u_chunks = _as_chunks(u_buckets, mesh)
    i_chunks = _as_chunks(i_buckets, mesh)
    u, du = _run_half(u, i, jnp.float32(u_reg), u_chunks, mode, mesh)
    i, di = _run_half(i, u, jnp.float32(i_reg), i_chunks, mode, mesh)
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
