"""
Fused MIPS top-k retrieval kernel (Pallas, TPU).

The serving hot path (reference: the per-query scorer + ``argtopn`` pair,
src/accel/knn/accum.rs + src/accel/data/sorting.rs; batch path
src/lenskit/batch/_runner.py:311) re-designed as ONE fused TPU kernel:

    scores = Q @ Iᵀ (+ item bias) (+ exclusion mask)  →  running top-k

The XLA path (``batch/device.py::_batch_topn``) materializes the full
(B, n_items) score matrix in HBM (one f32 write + one f32 read = 8 B/score)
before ``lax.top_k``.  This kernel instead streams item tiles through VMEM,
computes each (QB, NT) score tile on the MXU, and merges it into a running
per-query top-k buffer held in VMEM — the score matrix never touches HBM.
HBM traffic drops to the embedding reads (+1 B/score when an exclusion mask
is used), which is the memory floor for exact retrieval.

The merge is iterative max-extraction (k VPU passes over each tile), so the
kernel targets *small k* (top-10/20 retrieval).  Measured on v5e (B=1024
queries, D=64, k=10, honest device sync):

    n_items = 27k:  XLA matmul+top_k 4.2 ms — WINS (scores fit on-chip and
                    XLA fuses well at this size); this kernel 13.3 ms
    n_items = 500k: this kernel 28.3 ms — WINS; XLA 34.0 ms

So this is the *large-catalog* retrieval path (``ops.topk.retrieval_topk``
dispatches on catalog size); the XLA path stays the default.  For large k
(e.g. k=512 kNN neighbor tables) the ``approx_max_k`` path in ``ops/knn.py``
remains the right tool.

Runs compiled on TPU; everywhere else (CPU test meshes) it runs in Pallas
interpreter mode so the same kernel body is exercised by the test suite.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu import works on CPU builds too; guard for safety
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["mips_topk", "MAX_FUSED_K"]

#: largest k the fused merge handles efficiently (k VPU passes per tile)
MAX_FUSED_K = 64

_NEG_INF = float("-inf")
_BIG_I32 = np.iinfo(np.int32).max


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _topk_kernel(q_ref, i_ref, b_ref, m_ref, ov_ref, oi_ref, bv_ref, bi_ref, *, k, pad, nt, masked):
    """One (query-block, item-tile) grid step.

    Scratch ``bv/bi`` persist across the item-tile grid dimension: lanes
    [0, pad) hold the running top-k, lanes [pad, pad+nt) receive the tile.
    """
    j = pl.program_id(1)
    qb = q_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        bv_ref[:, :pad] = jnp.full((qb, pad), _NEG_INF, dtype=jnp.float32)
        bi_ref[:, :pad] = jnp.full((qb, pad), _BIG_I32, dtype=jnp.int32)

    # MXU: (QB, D) @ (D, NT) — item tile arrives transposed for free via BlockSpec
    scores = jnp.dot(q_ref[:], i_ref[:].T, preferred_element_type=jnp.float32)
    # bias row kills padding columns (−inf) and carries any item bias
    scores = scores + b_ref[:]
    gcols = j * nt + jax.lax.broadcasted_iota(jnp.int32, (qb, nt), 1)
    if masked:
        scores = jnp.where(m_ref[:] != 0, _NEG_INF, scores)

    bv_ref[:, pad:] = scores
    bi_ref[:, pad:] = gcols

    v = bv_ref[:]
    d = bi_ref[:]
    # k rounds of max-extraction on the VPU; ties broken by smallest index
    for t in range(k):
        m = jnp.max(v, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(v == m, d, _BIG_I32), axis=1, keepdims=True)
        bv_ref[:, t] = m[:, 0]
        bi_ref[:, t] = sel[:, 0]
        v = jnp.where((v == m) & (d == sel), _NEG_INF, v)

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        ov_ref[:] = bv_ref[:, :pad]
        oi_ref[:] = bi_ref[:, :pad]


@partial(jax.jit, static_argnames=("k", "qb", "nt", "interpret"))
def _mips_topk_padded(queries, items, i_bias, mask, *, k, qb, nt, interpret):
    """queries (B, D) and items (N, D) pre-padded to qb/nt multiples."""
    B, D = queries.shape
    N = items.shape[0]
    pad = 128 * max(1, -(-k // 128))
    masked = mask is not None
    grid = (B // qb, N // nt)
    in_specs = [
        pl.BlockSpec((qb, D), lambda i, j: (i, 0)),
        pl.BlockSpec((nt, D), lambda i, j: (j, 0)),
        pl.BlockSpec((1, nt), lambda i, j: (0, j)),
    ]
    args = [queries, items, i_bias]
    if masked:
        in_specs.append(pl.BlockSpec((qb, nt), lambda i, j: (i, j)))
        args.append(mask)
    else:
        in_specs.append(pl.BlockSpec((1, nt), lambda i, j: (0, j)))
        args.append(i_bias)  # placeholder, unread
    kern = partial(_topk_kernel, k=k, pad=pad, nt=nt, masked=masked)
    kwargs = {}
    if pltpu is not None and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * B * N * D + 4 * k * B * (N + grid[1] * pad),
            bytes_accessed=B * D * 4 + N * D * 4 * grid[0] + (B * N if masked else 0),
            transcendentals=0,
        )
    scratch = [
        pltpu.VMEM((qb, pad + nt), jnp.float32),
        pltpu.VMEM((qb, pad + nt), jnp.int32),
    ]
    vals, idx = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((qb, pad), lambda i, j: (i, 0)),
            pl.BlockSpec((qb, pad), lambda i, j: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, pad), jnp.float32),
            jax.ShapeDtypeStruct((B, pad), jnp.int32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(*args)
    return vals[:, :k], idx[:, :k]


def mips_topk(
    queries,
    items,
    k: int,
    *,
    i_bias=None,
    exclude=None,
    qb: int = 256,
    nt: int = 512,
):
    """
    Exact top-k maximum-inner-product search, fused on TPU.

    Args:
        queries: (B, D) f32 query vectors.
        items: (N, D) f32 item vectors.
        k: list length (≤ :data:`MAX_FUSED_K`).
        i_bias: optional (N,) f32 additive item bias.
        exclude: optional (B, N) int8/bool — nonzero entries are excluded
            (scored −inf); the caller builds it with one XLA scatter.
        qb, nt: query-block and item-tile sizes (VMEM budget knobs).

    Returns:
        (values (B, k) f32 descending, indices (B, k) int32; −inf/INT32_MAX
        mark slots beyond the number of scoreable items).
    """
    if k > MAX_FUSED_K:
        raise ValueError(f"fused top-k supports k <= {MAX_FUSED_K}, got {k}")
    queries = jnp.asarray(queries, jnp.float32)
    items = jnp.asarray(items, jnp.float32)
    B, D = queries.shape
    N = items.shape[0]
    qb = min(qb, _round_up(B, 8))
    nt = min(nt, _round_up(N, 128))
    Bp, Np = _round_up(B, qb), _round_up(N, nt)
    if Bp != B:
        queries = jnp.pad(queries, ((0, Bp - B), (0, 0)))
    if Np != N:
        items = jnp.pad(items, ((0, Np - N), (0, 0)))
    bias = jnp.zeros((1, Np), jnp.float32)
    if i_bias is not None:
        bias = bias.at[0, :N].set(jnp.asarray(i_bias, jnp.float32))
    # out-of-range padding columns are killed in-kernel via n_items=N... but we
    # padded items to Np; pass the padded count and kill [N, Np) through bias
    if Np != N:
        bias = bias.at[0, N:].set(_NEG_INF)
    mask = None
    if exclude is not None:
        mask = jnp.asarray(exclude, jnp.int8)
        if mask.shape != (Bp, Np):
            mask = jnp.pad(mask, ((0, Bp - B), (0, Np - N)))
    vals, idx = _mips_topk_padded(queries, items, bias, mask, k=k, qb=qb, nt=nt, interpret=_interpret())
    return vals[:B], idx[:B]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m
