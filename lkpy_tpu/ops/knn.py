"""
k-NN similarity and scoring kernels.

TPU-native replacement for the reference Rust kNN kernels
(reference: src/accel/knn/item_train.rs:95 — CSR×CSRᵀ row sweep with top-k
truncation; src/accel/knn/item_score.rs:23,72 — per-target bounded heaps;
src/accel/knn/accum.rs — k-largest accumulators).

Design:

- **Similarity build**: the normalized item matrix is densified in
  (item-tile × user-chunk) blocks; each tile computes ``S_tile = T @ Aᵀ``
  on the MXU, accumulating over user chunks, then applies the min_sim
  threshold and a ``jax.lax.top_k`` truncation.  The result is a *padded
  neighbor table* ``(n_items, K)`` — dense, static-shape, gather-friendly —
  instead of the reference's ragged Arrow CSR.
- **Scoring**: per query, the user's ratings are scattered into a dense
  (n_items,) vector; each target gathers its neighbor row, masks to rated
  neighbors, takes the top ``max_nbrs`` sims, and reduces.  One jitted
  program scores every target at once (vs. the reference's per-item heaps).

Scoring matches the reference direction exactly: contributions accumulate
over *rated items'* neighbor rows (a target is scoreable only if it appears
in some rated item's truncated neighbor list), which matters for top-N
quality when rows are truncated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.utils.residency import ResidentCache

__all__ = [
    "normalize_item_matrix",
    "similarity_topk",
    "score_items_explicit",
    "score_items_implicit",
    "invalidate_knn_caches",
    "NeighborTable",
]

from typing import NamedTuple


class NeighborTable(NamedTuple):
    """Padded top-K neighbor table; sim == 0 marks padding."""

    indices: np.ndarray  # (n_items, K) int32
    sims: np.ndarray  # (n_items, K) f32, descending per row

    @property
    def n_items(self) -> int:
        return self.indices.shape[0]

    @property
    def k(self) -> int:
        return self.indices.shape[1]

    def counts(self) -> np.ndarray:
        return (self.sims > 0).sum(axis=1).astype(np.int32)


_row_scale_cache = ResidentCache("knn_row_scale", max_entries=8)


def invalidate_knn_caches() -> None:
    """Drop the identity-keyed device-resident kNN caches (row scales and
    resident Gram structure).  Called by
    :func:`lkpy_tpu.batch.device.invalidate_device_cache` — the caches key
    by object identity, which an IN-PLACE mutation of a CSR does not
    change, so mutating callers must invalidate explicitly."""
    _row_scale_cache.clear()
    _resident_struct.clear()


def _note_row_scale(csr: CSR, row_scale: np.ndarray) -> None:
    """Record that ``csr``'s values are row-constant (= ``row_scale`` per
    row) in a weak side table, so the Gram path skips its detection pass.
    CSR ``fields`` hold per-entry arrays, so a per-row annotation cannot
    ride there."""
    _row_scale_cache.put(csr, row_scale)


def _get_row_scale(csr: CSR) -> np.ndarray | None:
    return _row_scale_cache.get(csr)


def _segment_sums(vals: np.ndarray, rowptr: np.ndarray, nrows: int) -> np.ndarray:
    """Per-row sums of CSR-contiguous values via ``np.add.reduceat`` —
    several times faster than bincount-with-weights at ML-20M nnz (no f64
    cast, no (nnz,) row-index materialization)."""
    lens = np.diff(rowptr)
    nz = np.flatnonzero(lens > 0)
    out = np.zeros(nrows, dtype=np.float64)
    if len(nz):
        # consecutive non-empty starts segment the value array exactly
        # (empty rows contribute no entries between them)
        out[nz] = np.add.reduceat(vals.astype(np.float64, copy=False), rowptr[:-1][nz])
    return out


def normalize_item_matrix(iu_csr: CSR, *, explicit: bool) -> tuple[CSR, np.ndarray | None]:
    """
    Center (explicit only) and unit-normalize item vectors
    (reference: knn/item.py:203 ``_center_ratings`` / :222 ``_normalize_rows``).

    ``iu_csr`` is item-major (rows = items, cols = users).
    """
    lens = iu_csr.row_lengths()
    rowptr = iu_csr.rowptr
    nrows = iu_csr.nrows
    raw = iu_csr.values
    means = None
    if not explicit and (raw is None or (len(raw) and raw[0] > 0 and np.all(raw == raw[0]))):
        # implicit fast path for (globally) constant values: the normalized
        # value of every entry of row i is exactly 1/sqrt(len_i) — one
        # np.repeat instead of four O(nnz) passes (the host normalize cost
        # 0.5-3 s at ML-20M scale), and the per-row scale rides along as a
        # field so the Gram path skips its row-constant detection pass
        row_scale = np.zeros(nrows, dtype=np.float32)
        nz = lens > 0
        row_scale[nz] = 1.0 / np.sqrt(lens[nz].astype(np.float64))
        out = iu_csr.with_values(np.repeat(row_scale, lens))
        _note_row_scale(out, row_scale)
        return out, None
    vals = raw if raw is not None else np.ones(iu_csr.nnz, dtype=np.float32)
    vals = np.asarray(vals, dtype=np.float32)
    if explicit:
        sums = _segment_sums(vals, rowptr, nrows)
        means = np.zeros(nrows, dtype=np.float32)
        np.divide(sums, lens, out=means, where=lens > 0, casting="unsafe")
        vals = vals - np.repeat(means, lens)
    norms = np.sqrt(_segment_sums(vals * vals, rowptr, nrows))
    scale = 1.0 / np.maximum(norms, np.finfo(np.float32).smallest_normal)
    vals = vals * np.repeat(scale.astype(np.float32), lens)
    return iu_csr.with_values(vals.astype(np.float32, copy=False)), means


@partial(jax.jit, static_argnames=("k",))
def _tile_topk(acc: jax.Array, row_ids: jax.Array, min_sim: jax.Array, k: int):
    """Threshold + top-k one similarity tile; masks the self-similarity diagonal."""
    n = acc.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    self_mask = cols == row_ids[:, None]
    acc = jnp.where(self_mask | (acc < min_sim), 0.0, acc)
    sims, idx = jax.lax.top_k(acc, k)
    return sims, idx.astype(jnp.int32)


def _topk(x, k: int, approx: bool):
    """Row-wise top-k: TPU-optimized approximate partial reduction by default
    (exact top_k at k=512 over ~27k columns costs ~16s/tile on v5e; approx
    recall at these shapes measures 1.0), exact on request."""
    if approx:
        return jax.lax.approx_max_k(x, k, recall_target=0.95)
    return jax.lax.top_k(x, k)


@partial(jax.jit, static_argnames=("tile",))
def _slice_rows_at(S: jax.Array, start: jax.Array, tile: int) -> jax.Array:
    """Row slice with a traced offset — ONE compiled program for all tiles.

    Kept separate from the top-k program: fusing the slice of a multi-GB
    operand into the top-k made a single program whose (remote) compile took
    minutes; two small programs compile in seconds."""
    return jax.lax.dynamic_slice_in_dim(S, start, tile, axis=0)


@partial(jax.jit, static_argnames=("k", "approx", "compact"))
def _block_topk(
    block: jax.Array, start: jax.Array, min_sim: jax.Array, k: int, approx: bool, compact: bool = False
):
    """Threshold + self-mask + top-k for one (tile, n_items) block.

    ``compact`` returns (f16 sims, u16 indices when the catalog fits) — the
    (n_items, K) table readback is 13.8 MB at the ML-20M shape and the
    remote-device transfer runs at ~6-38 MB/s, so halving the bytes is worth
    ~0.5 s of build time; f16 keeps 10 mantissa bits (finer than the bf16
    Gram that feeds it)."""
    row_ids = start.astype(jnp.int32) + jax.lax.broadcasted_iota(jnp.int32, (block.shape[0], 1), 0)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, block.shape, 1)
    self_mask = cols == row_ids[:, None]
    block = jnp.where(self_mask | (block < min_sim), 0.0, block)
    sims, idx = _topk(block, k, approx)
    if compact:
        idt = jnp.uint16 if block.shape[1] <= 65536 else jnp.int32
        return sims.astype(jnp.float16), idx.astype(idt)
    return sims, idx.astype(jnp.int32)


def _tile_topk_at(
    S: jax.Array, start: jax.Array, min_sim: jax.Array, k: int, tile: int, approx: bool = False, compact: bool = False
):
    block = _slice_rows_at(S, start, tile)
    return _block_topk(block, start, min_sim, k, approx, compact)


@partial(jax.jit, static_argnames=("tile",))
def _matmul_at(A: jax.Array, start: jax.Array, tile: int) -> jax.Array:
    T = jax.lax.dynamic_slice_in_dim(A, start, tile, axis=0)
    return jnp.dot(T, A.T, preferred_element_type=jnp.float32)


def _matmul_topk_at(A: jax.Array, start: jax.Array, min_sim: jax.Array, k: int, tile: int, approx: bool = False):
    """Dense-path tile: scores = A[start:start+tile] @ Aᵀ, threshold + top-k."""
    acc = _matmul_at(A, start, tile)
    return _block_topk(acc, start, min_sim, k, approx)


def _host_densify(csr: CSR, lo: int, hi: int) -> np.ndarray:
    """Densify CSR rows [lo, hi) on the host via flat scatter (O(nnz))."""
    s, e = int(csr.rowptr[lo]), int(csr.rowptr[hi])
    lens = (csr.rowptr[lo + 1 : hi + 1] - csr.rowptr[lo:hi]).astype(np.int64)
    rel_rows = np.repeat(np.arange(hi - lo, dtype=np.int64), lens)
    dense = np.zeros((hi - lo, csr.ncols), dtype=np.float32)
    vals = csr.values[s:e] if csr.values is not None else 1.0
    dense[rel_rows, csr.colind[s:e]] = vals
    return dense


@partial(jax.jit, donate_argnums=(0,), static_argnames=("n_rows", "n_cols", "bf16"))
def _gram_accum_sparse(
    S: jax.Array,
    rel_rows: jax.Array,  # (nnz_pad,) int32, OOB = padding
    cols: jax.Array,  # (nnz_pad,) int32
    vals: jax.Array,  # (nnz_pad,) f32
    n_rows: int,
    n_cols: int,
    bf16: bool = False,
) -> jax.Array:
    """Accumulate S += UᵀU where U is given sparsely and densified on device
    (host→device traffic is O(nnz), not O(dense)).

    With ``bf16`` the dense slab is bfloat16 with f32 MXU accumulation —
    ~4× the f32 matmul rate on v5e (measured 34 TF/s f32).  The normalized
    values are in [0, 1] so the ~0.4% bf16 input rounding perturbs
    similarities near the min_sim threshold and can reorder near-tied
    neighbors vs the reference's exact kernel; it is policy-controlled
    (:func:`knn_bf16_default`, ``LKT_KNN_BF16_GRAM=0`` opts out) and a
    failed recall validation rebuilds the whole Gram in f32."""
    dt = jnp.bfloat16 if bf16 else jnp.float32
    U = jnp.zeros((n_rows, n_cols), dtype=dt)
    U = U.at[rel_rows, cols].set(vals.astype(dt), mode="drop")
    return S + jnp.dot(U.T, U, preferred_element_type=jnp.float32)


@partial(jax.jit, donate_argnums=(0,), static_argnames=("user_chunk", "n_items", "nnz_pad", "bf16"))
def _gram_accum_resident(
    S: jax.Array,
    colind: jax.Array,  # (nnz + nnz_pad,) uint16 — resident user-major columns (zero-padded tail)
    rowptr: jax.Array,  # (n_users_pad + 1,) int32 — resident, final value repeated past n_users
    row_of: jax.Array,  # (nnz + nnz_pad,) int32 — resident per-entry row index
    scale: jax.Array,  # (n_items,) f32 per-item value (row-constant matrices)
    ulo,  # traced int32 scalar: first user of this chunk
    *,
    user_chunk: int,
    n_items: int,
    nnz_pad: int,
    bf16: bool,
) -> jax.Array:
    """Zero-upload Gram chunk: everything (structure, values) is derived on
    device from the resident CSR.  The relative row of each entry comes from
    a vectorized binary search over the chunk's row-pointer window — the
    host ships nothing per chunk (vs 4-6 bytes/nnz for the packed forms).

    The resident buffers are padded at upload so the ``dynamic_slice`` below
    never clamps (which would misalign positions): ``colind`` and ``row_of``
    by ``nnz_pad`` entries, ``rowptr`` by repeating its final value
    ``user_chunk`` times."""
    s = rowptr[ulo]
    e = rowptr[ulo + user_chunk]
    seg_cols = jax.lax.dynamic_slice(colind, (s,), (nnz_pad,)).astype(jnp.int32)
    pos = s + jnp.arange(nnz_pad, dtype=jnp.int32)
    valid = pos < e
    seg_row = jax.lax.dynamic_slice(row_of, (s,), (nnz_pad,))
    rel = jnp.where(valid, seg_row - ulo, user_chunk)  # OOB -> dropped
    dt = jnp.bfloat16 if bf16 else jnp.float32
    U = jnp.zeros((user_chunk, n_items), dtype=dt)
    U = U.at[rel, seg_cols].set(scale[seg_cols].astype(dt), mode="drop")
    return S + jnp.dot(U.T, U, preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("nnz", "pad"))
def _row_of_entries(rowptr_core, nnz: int, pad: int):
    """Per-entry row index of a CSR: +1 scatter at each row start, cumsum —
    one O(nnz) pass, computed ONCE per build (a per-chunk binary search cost
    ~0.8 s/chunk at ML-20M scale: 17 gather rounds over 9M positions)."""
    marks = jnp.zeros((nnz + pad,), jnp.int32).at[rowptr_core].add(1, mode="drop")
    return jnp.cumsum(marks)


_resident_struct = ResidentCache("knn_gram", max_entries=4)

_i32_cache: dict = {}


def _i32_dev(x: int) -> jax.Array:
    """Device-resident int32 scalar cached by value (chunk offsets repeat
    across builds; a fresh ``jnp.int32`` would cost an upload each)."""
    hit = _i32_cache.get(x)
    if hit is None:
        if len(_i32_cache) > 512:
            _i32_cache.clear()
        hit = _i32_cache[x] = jnp.int32(x)
    return hit


@partial(jax.jit, donate_argnums=(0,), static_argnames=("n_rows", "n_cols", "bf16"))
def _gram_accum_packed2(
    S: jax.Array,
    buf: jax.Array,  # (nnz_pad, 2) uint16: [rel_row, col]
    scale: jax.Array,  # (n_cols,) f32 — per-item value (row-constant matrices)
    n_rows: int,
    n_cols: int,
    bf16: bool = True,
) -> jax.Array:
    """Structure-only transfer form of :func:`_gram_accum_sparse` for
    matrices whose values are constant per ITEM (the implicit-feedback case:
    every entry of item i is its normalization 1/||i||): ship only
    [rel_row, col] uint16 pairs — 4 bytes/nnz, 2/3 of the packed triple —
    and gather the value from a device-resident per-item scale vector."""
    rel = buf[:, 0].astype(jnp.int32)
    cols = buf[:, 1].astype(jnp.int32)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    U = jnp.zeros((n_rows, n_cols), dtype=dt)
    U = U.at[rel, cols].set(scale[cols].astype(dt), mode="drop")
    return S + jnp.dot(U.T, U, preferred_element_type=jnp.float32)


@partial(jax.jit, donate_argnums=(0,), static_argnames=("n_rows", "n_cols", "bf16"))
def _gram_accum_packed(
    S: jax.Array,
    buf: jax.Array,  # (nnz_pad, 3) uint16: [rel_row, col, value-as-bf16-bits]
    n_rows: int,
    n_cols: int,
    bf16: bool = True,
) -> jax.Array:
    """Packed-transfer form of :func:`_gram_accum_sparse`: one uint16 buffer
    per chunk (half the bytes, a third of the host→device round-trips —
    the transfer phase measured 2.9 s of the 7.2 s 27k build).  Only valid
    for catalogs/chunks under 64k (indices must fit uint16) on the bf16
    slab path (values are shipped as bf16 bits)."""
    rel = buf[:, 0].astype(jnp.int32)
    cols = buf[:, 1].astype(jnp.int32)
    vals = jax.lax.bitcast_convert_type(buf[:, 2], jnp.bfloat16)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    U = jnp.zeros((n_rows, n_cols), dtype=dt)
    U = U.at[rel, cols].set(vals.astype(dt), mode="drop")
    return S + jnp.dot(U.T, U, preferred_element_type=jnp.float32)


#: neighbor-table recall floor for the approximate top-k path: measured on a
#: row sample against exact top-k; below this the build redoes itself exactly
APPROX_RECALL_TARGET = 0.98
_RECALL_SAMPLE_ROWS = 256


def knn_bf16_default() -> bool:
    """Default bf16-Gram-slab policy for the similarity build: on for TPU
    (where it is ~4× the f32 Gram rate), off elsewhere; ``LKT_KNN_BF16_GRAM``
    overrides (``0``/``false`` disables, anything else enables)."""
    import os

    v = os.environ.get("LKT_KNN_BF16_GRAM")
    if v is not None:
        return v not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def _sample_recall(exact_fn, out_idx, k: int, n_items: int, seed: int = 0) -> float:
    """Neighbor-table recall of the approx build on a row sample, vs exact.

    Rows are sampled as uniform random windows across the catalog — item
    numbering is usually popularity-correlated, so a head-only sample would
    be biased toward dense rows where approximate top-k is easiest."""
    total_rows = min(_RECALL_SAMPLE_ROWS, n_items)
    win = min(64, total_rows)
    n_win = max(total_rows // win, 1)
    rng = np.random.default_rng(seed)
    if n_items > win:
        starts = np.sort(rng.choice(n_items - win, size=n_win, replace=False))
    else:
        starts = np.array([0])
    hits = 0
    total = 0
    for s in starts:
        sims, idx = exact_fn(int(s), win)
        idx = np.asarray(idx)
        sims = np.asarray(sims)
        for r in range(win):
            exact_set = set(idx[r][sims[r] > 0].tolist())
            if not exact_set:
                continue
            approx_row = out_idx[int(s) + r]
            hits += len(exact_set.intersection(approx_row.tolist()))
            total += len(exact_set)
    return hits / total if total else 1.0


def similarity_topk(
    iu_csr: CSR,
    k: int,
    min_sim: float = 1.0e-6,
    *,
    tile: int = 8192,
    max_dense_bytes: int = 4 << 30,
    approx: bool | None = None,
    recall_validate: bool = True,
    bf16: bool | None = None,
    user_major: CSR | None = None,
    timings: dict | None = None,
) -> NeighborTable:
    """
    Top-K thresholded cosine similarity (reference: item_train.rs:95).

    ``iu_csr`` must already be normalized (items × users).  Two device paths:

    - small matrices: densify A once, tiled ``T @ Aᵀ`` + top-k;
    - large matrices (ML-20M+): accumulate the full Gram ``S = Σ UᵀU`` over
      dense *user* chunks (each an MXU matmul), then tiled threshold+top-k.
      S is n_items² f32 — fine through ~50k items on one chip; beyond that,
      pass a mesh via :func:`lkpy_tpu.parallel.knn.sharded_similarity_topk`.

    ``bf16`` controls the Gram slab precision on the large path.  The
    default enables bf16 only where the recall validation below guards it
    (TPU + approx + ``recall_validate``; ``LKT_KNN_BF16_GRAM=0`` opts out
    globally) — a failed validation rebuilds the Gram in f32.

    When the approximate top-k path is used (large catalogs on TPU), the
    result's recall is validated on a ``_RECALL_SAMPLE_ROWS`` row sample
    against exact top-k; if it dips below :data:`APPROX_RECALL_TARGET` the
    build is redone exactly (``recall_validate=False`` skips the check).
    """
    n_items, n_users = iu_csr.shape
    k = min(k, max(n_items - 1, 1))
    if approx is None:
        approx = n_items >= 8192  # exact for small catalogs (and oracle tests)
    min_sim_j = jnp.float32(max(min_sim, float(np.finfo(np.float32).smallest_normal)))

    out_idx = np.empty((n_items, k), dtype=np.int32)
    out_sim = np.empty((n_items, k), dtype=np.float32)

    tile = min(tile, n_items)

    def run_tiles(fn, *args, approx_flag=None, compact=False):
        """Iterate tiles with a traced start offset (single compiled program);
        the final tile overlaps backward to keep the shape static.  All tile
        programs enqueue ASYNC, then one readback pass — per-tile syncs cost
        a host round-trip each on remote backends (14 tiles ≈ 1.4 s of pure
        RTT in the 27k build); the tile outputs are small (tile×k), so the
        queue stays shallow even with every tile in flight."""
        af = approx if approx_flag is None else approx_flag
        pending = []
        for lo in range(0, n_items, tile):
            start = min(lo, n_items - tile)
            sims, idx = fn(*args, _i32_dev(start), min_sim_j, k, tile, af, compact)
            sims.copy_to_host_async()
            idx.copy_to_host_async()
            pending.append((lo, start, sims, idx))
        for lo, start, sims, idx in pending:
            off = lo - start
            out_sim[lo : start + tile] = np.asarray(sims)[off:]
            out_idx[lo : start + tile] = np.asarray(idx)[off:]

    def check_recall(exact_tile_fn, *args) -> bool:
        """Validate approx recall on a row sample; True = acceptable."""
        if not (approx and recall_validate):
            return True
        rec = _sample_recall(
            lambda s, rows: exact_tile_fn(*args, jnp.int32(s), min_sim_j, k, rows, False),
            out_idx,
            k,
            n_items,
        )
        if rec >= APPROX_RECALL_TARGET:
            return True
        import warnings

        warnings.warn(
            f"approx top-k neighbor recall {rec:.3f} < {APPROX_RECALL_TARGET}; rebuilding exact",
            stacklevel=3,
        )
        return False

    dense_bytes = n_items * n_users * 4
    if dense_bytes <= max_dense_bytes:
        A = jnp.asarray(_host_densify(iu_csr, 0, n_items))  # (n_items, n_users)
        fn = lambda A, s, m, k, t, af, cp=False: _matmul_topk_at(A, s, m, k=k, tile=t, approx=af)
        run_tiles(fn, A)
        if not check_recall(fn, A):
            run_tiles(fn, A, approx_flag=False)
    else:
        # Gram accumulation over user chunks (ALX-style two-pass); sparse
        # chunks are densified ON DEVICE so host→device traffic is O(nnz).
        # Chunks are EQUALIZED (ceil split) — a budget-sized final chunk can
        # be half empty, and the dense slab matmul pays for its full shape
        # (measured ~15% of the 27k Gram on the ragged split).
        if bf16 is None:
            # default bf16 only where the recall validation below actually
            # runs (the approx path); without it bf16 rounding would be
            # unguarded — callers can still force bf16=True explicitly
            bf16 = knn_bf16_default() and approx and recall_validate
        # the dense slab is bf16 on the fast path — budget twice the users
        # per chunk (fewer, larger MXU matmuls, fewer sync points)
        slab_bytes = 2 if bf16 else 4
        budget_chunk = max(max_dense_bytes // (n_items * slab_bytes), 1024)
        # the packed/resident fast paths index chunk-relative rows as uint16;
        # a generous byte budget must not push user_chunk past that and
        # silently route to the slow per-chunk-shipment path (measured: the
        # resident path with ~10k-user chunks beats two 69k-user non-resident
        # chunks 2.6 s vs 4.6 s at the 27k-item bench shape — chunk dispatches
        # are async and cheap, host shipment is not)
        if bf16 and n_items < 65_535:
            budget_chunk = min(budget_chunk, 65_534)
        n_chunks = max(-(-n_users // budget_chunk), 1)
        user_chunk = -(-n_users // n_chunks)
        import time as _time

        t_p = _time.perf_counter()
        # row-constant values (implicit feedback: every entry of item i is
        # its normalization 1/||i||) need no value transfer at all — the
        # per-item scale vector lives on device and values are gathered there
        packed_ok = bf16 and n_items < 65_535 and user_chunk < 65_535
        col_scale = None
        if packed_ok:
            col_scale = _get_row_scale(iu_csr)  # normalize fast path
        if packed_ok and col_scale is None and iu_csr.values is not None:
            lens_i = np.diff(iu_csr.rowptr)
            first = np.zeros(n_items, dtype=np.float32)
            nz_rows = lens_i > 0
            first[nz_rows] = iu_csr.values[iu_csr.rowptr[:-1][nz_rows]]
            if np.array_equal(iu_csr.values, np.repeat(first, lens_i)):
                col_scale = first
        scale_dev = None if col_scale is None else jnp.asarray(col_scale)

        # fully-resident path: when the caller supplies the (stable)
        # user-major structure and values are row-constant, upload colind
        # (uint16) + rowptr once and derive every chunk ON DEVICE — no host
        # transpose, no per-chunk packing, ~2 bytes/nnz of total transfer
        # (the r4 build spent 2.1-3.4 s on host prep + 80-120 MB of chunk
        # shipments at the same shape)
        resident = (
            col_scale is not None
            and user_major is not None
            and user_major.nnz == iu_csr.nnz
            and user_major.nrows == n_users
        )
        ui_csr = None
        chunks: list = []
        if resident:
            cached = _resident_struct.get(user_major, extra=user_chunk)
            if cached is not None:
                col_res, rp_res, row_of, nnz_pad = cached
            else:
                rp32 = user_major.rowptr.astype(np.int32)
                nnz_max = int(
                    np.max(
                        [
                            rp32[min(u + user_chunk, n_users)] - rp32[u]
                            for u in range(0, n_users, user_chunk)
                        ]
                    )
                )
                step = max(_pad_pow2(nnz_max) // 8, 8)
                nnz_pad = -(-nnz_max // step) * step
                # pad so device-side dynamic slices never clamp (see kernel doc)
                col_res = jnp.asarray(
                    np.pad(user_major.colind.astype(np.uint16), (0, nnz_pad))
                )
                rp_res = jnp.asarray(np.pad(rp32, (0, user_chunk), mode="edge"))
                row_of = _row_of_entries(jnp.asarray(rp32[1:-1]), int(user_major.nnz), nnz_pad)
                # the structure is immutable and device-resident by design
                # (same policy as serving's resident CSR): rebuilds over the
                # same matrix — tuning sweeps, config grids — skip the upload
                _resident_struct.put(user_major, (col_res, rp_res, row_of, nnz_pad), extra=user_chunk)
            chunk_starts = list(range(0, n_users, user_chunk))
        else:
            # NOTE: user_major carries RAW values; the general path needs the
            # normalized ones, so it always transposes iu_csr itself
            ui_csr = iu_csr.transpose()
            for ulo in range(0, n_users, user_chunk):
                uhi = min(ulo + user_chunk, n_users)
                s, e = int(ui_csr.rowptr[ulo]), int(ui_csr.rowptr[uhi])
                lens = (ui_csr.rowptr[ulo + 1 : uhi + 1] - ui_csr.rowptr[ulo:uhi]).astype(np.int64)
                rel = np.repeat(np.arange(uhi - ulo, dtype=np.int32), lens)
                chunks.append((rel, ui_csr.colind[s:e], ui_csr.values[s:e] if ui_csr.values is not None else np.ones(e - s, np.float32)))
            # pad to a shared width at 1/8-step granularity (pow2 padding
            # wasted ~17% of the transfer on the ML-20M shape)
            nnz_max = max(len(c[0]) for c in chunks)
            step = max(_pad_pow2(nnz_max) // 8, 8)
            nnz_pad = -(-nnz_max // step) * step
        # pack each chunk into ONE device buffer when indices fit uint16
        # (catalogs < 64k items): [rel, col, val-as-bf16-bits] — HALF the
        # bytes and a third of the host→device round-trips of three f32/i32
        # arrays; transfers are NOT pre-synced — each Gram step starts as
        # soon as its chunk lands, overlapping the remaining transfers
        packed = packed_ok
        if timings is not None:
            timings["prep_s"] = _time.perf_counter() - t_p

        def ship_one(c, use_packed: bool):
            rel, cc, vv = c
            pad = nnz_pad - len(rel)
            rel = np.pad(rel, (0, pad), constant_values=user_chunk)  # OOB -> dropped
            cc = np.pad(cc, (0, pad))
            if use_packed and scale_dev is not None:
                buf = np.empty((nnz_pad, 2), dtype=np.uint16)
                buf[:, 0] = rel
                buf[:, 1] = cc
                return (jnp.asarray(buf),)
            vv = np.pad(vv, (0, pad)).astype(np.float32)
            if use_packed:
                buf = np.empty((nnz_pad, 3), dtype=np.uint16)
                buf[:, 0] = rel
                buf[:, 1] = cc
                # bf16 bits via integer round-to-nearest-even — bit-identical
                # to a device-side f32→bf16 cast, ~20× ml_dtypes' astype
                u = vv.view(np.uint32)
                buf[:, 2] = ((u + 0x7FFF + ((u >> 16) & 1)) >> 16).astype(np.uint16)
                return (jnp.asarray(buf),)
            return (jnp.asarray(rel), jnp.asarray(cc), jnp.asarray(vv))

        def build_gram(use_bf16: bool):
            if resident:
                # one program, zero per-chunk transfer; chunk scalars hit the
                # _i32_dev cache after the first build of this shape
                S = jnp.zeros((n_items, n_items), dtype=jnp.float32)
                for ulo in chunk_starts:
                    S = _gram_accum_resident(
                        S,
                        col_res,
                        rp_res,
                        row_of,
                        scale_dev,
                        _i32_dev(ulo),
                        user_chunk=user_chunk,
                        n_items=n_items,
                        nnz_pad=nnz_pad,
                        bf16=use_bf16,
                    )
                    # sync per chunk: deep queues of donated multi-GB
                    # programs thrashed the remote backend (round-2 note)
                    jax.block_until_ready(S)
                return S
            # a packed (bf16-valued) shipment cannot serve an f32 rebuild —
            # re-ship the chunks as full f32 arrays in that case.  Host
            # packing of chunk c+1 overlaps the device's Gram of chunk c
            # (each is ~0.3 s on the ML-20M shape).
            use_packed = use_bf16 and packed
            S = jnp.zeros((n_items, n_items), dtype=jnp.float32)
            pending = None
            dispatched = 0
            for c in chunks + [None]:
                if pending is not None:
                    t = pending
                    if len(t) == 1 and t[0].shape[1] == 2:
                        S = _gram_accum_packed2(S, t[0], scale_dev, user_chunk, n_items, use_bf16)
                    elif len(t) == 1:
                        S = _gram_accum_packed(S, t[0], user_chunk, n_items, use_bf16)
                    else:
                        S = _gram_accum_sparse(S, t[0], t[1], t[2], user_chunk, n_items, use_bf16)
                    dispatched += 1
                # pack+ship the NEXT chunk while the device runs this Gram
                nxt = ship_one(c, use_packed) if c is not None else None
                # sync EVERY chunk: even a depth-2 queue of donated multi-GB
                # Gram programs thrashed the remote backend when the process
                # held other large buffers (19s builds vs 5s measured
                # isolated; same pathology as the round-2 async-queue note)
                if pending is not None:
                    jax.block_until_ready(S)
                pending = nxt
            jax.block_until_ready(S)
            return S

        t_g = _time.perf_counter()
        S = build_gram(bf16)
        if timings is not None:
            timings["gram_s"] = _time.perf_counter() - t_g
        t_t = _time.perf_counter()
        fn = lambda S, s, m, k, t, af, cp=False: _tile_topk_at(S, s, m, k=k, tile=t, approx=af, compact=cp)
        run_tiles(fn, S, compact=bool(bf16))
        if timings is not None:
            timings["topk_s"] = _time.perf_counter() - t_t
        if not check_recall(fn, S):
            # rebuild exactly: f32 Gram (bf16 rounding is invalidated too,
            # ADVICE r3) + exact top-k tiles.  The failed S is DROPPED
            # first — n_items² is the single-chip memory ceiling, and two
            # copies would OOM the recovery path at ~50k items.
            if bf16:
                S = None
                S = build_gram(False)
            run_tiles(fn, S, approx_flag=False)

    return NeighborTable(out_idx, out_sim)


@partial(jax.jit, static_argnames=("max_nbrs", "min_nbrs", "average", "n_items"))
def _score_targets(
    nbr_idx: jax.Array,  # (R, K) int32 — neighbor rows of the user's RATED items
    nbr_sim: jax.Array,  # (R, K) f32 (0 = padding)
    rated_vals: jax.Array,  # (R,) f32 — the user's (centered) ratings (0-padded)
    rated_mask: jax.Array,  # (R,) bool — padding mask over rated items
    max_nbrs: int,
    min_nbrs: int,
    average: bool,
    n_items: int,
):
    """
    Accumulate over rated items' neighbor rows — the reference direction
    (reference: src/accel/knn/item_score.rs:23): each rated item ri pushes
    (sim, rating) into every target in nbrs(ri); per target, keep the
    ``max_nbrs`` largest sims and reduce.

    Vectorized as a scatter into a dense (n_items, R) contribution matrix
    followed by a per-target top-k — no heaps, static shapes.
    """
    R, K = nbr_idx.shape
    sim_ok = jnp.where(rated_mask[:, None], nbr_sim, 0.0)  # (R, K)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (R, K), 0)
    # contributions[t, r] = sim(ri_r -> t), 0 if absent
    contrib = jnp.zeros((n_items, R), dtype=nbr_sim.dtype)
    # drop zero-sim (padding) entries by routing them out of bounds
    tgt = jnp.where(sim_ok > 0, nbr_idx, n_items)
    contrib = contrib.at[tgt, r_ids].set(sim_ok, mode="drop")
    k = min(max_nbrs, R)
    top_sims, top_pos = jax.lax.top_k(contrib, k)  # (n_items, k)
    valid = top_sims > 0
    counts = valid.sum(axis=1)
    weights = jnp.where(valid, top_sims, 0.0)
    if average:
        vals = rated_vals[top_pos]
        num = jnp.sum(weights * vals, axis=1)
        denom = jnp.sum(jnp.abs(weights), axis=1)
        scores = num / jnp.maximum(denom, np.finfo(np.float32).smallest_normal)
    else:
        scores = jnp.sum(weights, axis=1)
    scores = jnp.where(counts >= min_nbrs, scores, jnp.nan)
    return scores, counts.astype(jnp.int32)


def _pad_pow2(n: int, lo: int = 8) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


@partial(jax.jit, static_argnames=("max_nbrs", "min_nbrs", "average"))
def score_users_bucket(
    cols: jax.Array,  # (B, P) int32 — user numbers who rated each item
    vals: jax.Array,  # (B, P) f32 — their (centered) ratings
    mask: jax.Array,  # (B, P) bool
    sims: jax.Array,  # (n_users,) f32 — query-to-user similarities (0 = ineligible)
    max_nbrs: int,
    min_nbrs: int,
    average: bool,
):
    """User-kNN per-item scoring for one popularity bucket
    (reference: src/accel/knn/user_score.rs:22,62): top-``max_nbrs`` eligible
    raters per item, similarity-weighted average of centered ratings."""
    w = jnp.where(mask, sims[cols], 0.0)  # (B, P)
    k = min(max_nbrs, w.shape[1])
    top_w, top_pos = jax.lax.top_k(w, k)
    valid = top_w > 0
    counts = valid.sum(axis=1)
    weights = jnp.where(valid, top_w, 0.0)
    if average:
        top_vals = jnp.take_along_axis(vals, top_pos, axis=1)
        num = jnp.sum(weights * top_vals, axis=1)
        denom = jnp.sum(jnp.abs(weights), axis=1)
        scores = num / jnp.maximum(denom, np.finfo(np.float32).smallest_normal)
    else:
        scores = jnp.sum(weights, axis=1)
    scores = jnp.where(counts >= min_nbrs, scores, jnp.nan)
    return scores, counts.astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_rows",))
def sparse_matvec(rows: jax.Array, cols: jax.Array, vals: jax.Array, x: jax.Array, *, n_rows: int):
    """CSR-free COO matvec: y = A @ x via segment-sum (for user-similarity
    computation without densifying the user matrix)."""
    contrib = vals * x[cols]
    return jax.ops.segment_sum(contrib, rows, num_segments=n_rows)


def score_items_explicit(
    table: NeighborTable,
    target_nums: np.ndarray,
    rated_nums: np.ndarray,
    rated_vals: np.ndarray,
    item_means: np.ndarray,
    max_nbrs: int,
    min_nbrs: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Explicit item-kNN scoring (reference: item_score.rs:23
    ``score_explicit`` + accum.rs averaging): weighted average of centered
    ratings over the top-``max_nbrs`` rated neighbors, re-offset by item mean.

    Scores the *full* item set in one jitted program (history length padded
    to a power of two for shape reuse), then subsets to ``target_nums``.
    """
    n_items = table.n_items
    R = len(rated_nums)
    Rp = _pad_pow2(max(R, 1))
    idx = np.zeros(Rp, dtype=np.int32)
    idx[:R] = rated_nums
    vals = np.zeros(Rp, dtype=np.float32)
    vals[:R] = rated_vals.astype(np.float32) - item_means[rated_nums]
    mask = np.zeros(Rp, dtype=bool)
    mask[:R] = True

    scores, counts = _score_targets(
        jnp.asarray(table.indices[idx]),
        jnp.asarray(table.sims[idx]),
        jnp.asarray(vals),
        jnp.asarray(mask),
        max_nbrs,
        min_nbrs,
        True,
        n_items,
    )
    scores = np.asarray(scores)[target_nums] + item_means[target_nums]
    return scores, np.asarray(counts)[target_nums]


def score_items_implicit(
    table: NeighborTable,
    target_nums: np.ndarray,
    rated_nums: np.ndarray,
    max_nbrs: int,
    min_nbrs: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Implicit item-kNN scoring (reference: item_score.rs:72): sum of top
    neighbor similarities."""
    n_items = table.n_items
    R = len(rated_nums)
    Rp = _pad_pow2(max(R, 1))
    idx = np.zeros(Rp, dtype=np.int32)
    idx[:R] = rated_nums
    mask = np.zeros(Rp, dtype=bool)
    mask[:R] = True
    scores, counts = _score_targets(
        jnp.asarray(table.indices[idx]),
        jnp.asarray(table.sims[idx]),
        jnp.zeros(Rp, dtype=jnp.float32),
        jnp.asarray(mask),
        max_nbrs,
        min_nbrs,
        False,
        n_items,
    )
    return np.asarray(scores)[target_nums], np.asarray(counts)[target_nums]
