"""
Graph propagation ops shared by the LightGCN and FlexMF-convolution models.

The TPU-native replacement for torch_geometric's LightGCN propagation
(reference: src/lenskit/graphs/lightgcn.py:42 wraps ``torch_geometric.nn.
LightGCN``; FlexMF's convolution layers reuse the same propagation,
flexmf/_model.py:18): a symmetric-normalized bipartite SpMM, realised as
sorted segment sums for small graphs and as dense bf16 MXU matmuls (with
layout-pinned custom VJPs) for HBM-sized ones.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "propagate",
    "propagate_dense",
    "build_dense_adjacency",
    "dense_adjacency_eligible",
    "sorted_conv",
]


#: edge count above which the SpMM accumulates in fixed-size edge chunks.
#: The one-shot segment_sum materializes a (nnz, k) tensor (3.6 GB at
#: ML-20M/k=64, more with the backward pass) — that fits HBM as long as the
#: process isn't holding other multi-GB state, and it is MUCH faster than
#: the scan form (TPU scatter-add runs at a fixed row rate, so 28 chunked
#: scatters per SpMM cost minutes per epoch); the chunked fallback exists
#: for graphs whose edge tensor genuinely cannot fit.
_SPMM_CHUNK_MIN = 40_000_000
_SPMM_CHUNK = 524_288


def _spmm_chunked(vals, src_idx, dst_idx, src, n_dst):
    """dst[d] += Σ v·src[s] over edges, scanned in fixed-size chunks."""
    nnz = vals.shape[0]
    C = -(-nnz // _SPMM_CHUNK)
    pad = C * _SPMM_CHUNK - nnz
    v = jnp.pad(vals, (0, pad)).reshape(C, _SPMM_CHUNK)
    s = jnp.pad(src_idx, (0, pad)).reshape(C, _SPMM_CHUNK)
    d = jnp.pad(dst_idx, (0, pad), constant_values=n_dst).reshape(C, _SPMM_CHUNK)  # OOB -> drop

    def body(acc, xs):
        vv, ss, dd = xs
        return acc.at[dd].add(vv[:, None] * src[ss], mode="drop"), None

    acc, _ = jax.lax.scan(body, jnp.zeros((n_dst, src.shape[1]), src.dtype), (v, s, d))
    return acc


#: densified-adjacency budget: at ML-20M (138k × 27k) the bf16 dense A is
#: ~7.5 GB — resident once, and both propagate directions become MXU
#: matmuls (~477 GFlop each ≈ 10 ms) instead of segment sums whose
#: scatter/gather runs at ~10% of HBM (344 ms per fwd+bwd direction
#: measured).  0.4% density means 250× wasted FLOPs — and a ~30× win,
#: because the MXU is ~10,000× the scatter unit.
_DENSE_ADJ_MAX_BYTES = 8 << 30
_DENSE_ADJ_MIN_EDGES = 2_000_000


@jax.custom_vjp
def _adj_mm(adj, x):
    """``adj @ x`` with BOTH the forward and backward expressed in the
    matmul orientation that keeps the multi-GB ``adj`` in its resident
    row-major layout.  The autodiff-generated backward (``adjᵀ @ g``)
    otherwise makes XLA materialize a second 7.5 GB transposed adjacency
    at ML-20M scale — HBM OOM; ``(gᵀ @ adj)ᵀ`` contracts the same axis with
    only the small operand transposed."""
    return jnp.dot(adj, x.astype(adj.dtype), preferred_element_type=jnp.float32)


def _adj_mm_fwd(adj, x):
    return _adj_mm(adj, x), (adj,)


def _adj_mm_bwd(res, g):
    (adj,) = res
    gx = jnp.dot(g.astype(adj.dtype).T, adj, preferred_element_type=jnp.float32).T
    # d_adj is never consumed (the adjacency is constant); the zeros are
    # dead-code-eliminated by XLA
    return jnp.zeros_like(adj), gx


_adj_mm.defvjp(_adj_mm_fwd, _adj_mm_bwd)


@jax.custom_vjp
def _adj_tmm(adj, u):
    """``adjᵀ @ u`` via ``(uᵀ @ adj)ᵀ`` — see :func:`_adj_mm`."""
    return jnp.dot(u.astype(adj.dtype).T, adj, preferred_element_type=jnp.float32).T


def _adj_tmm_fwd(adj, u):
    return _adj_tmm(adj, u), (adj,)


def _adj_tmm_bwd(res, g):
    (adj,) = res
    gu = jnp.dot(adj, g.astype(adj.dtype), preferred_element_type=jnp.float32)
    return jnp.zeros_like(adj), gu


_adj_tmm.defvjp(_adj_tmm_fwd, _adj_tmm_bwd)


def propagate_dense(u, i, adj, blend):
    """LightGCN propagation with a dense bf16 adjacency (tile-aligned dims
    ≥ the table sizes): each direction is one MXU matmul with f32
    accumulation, in the adjacency's resident layout fwd AND bwd
    (:func:`_adj_mm`).  The small embedding operands pad up to the aligned
    dims and results slice back."""
    nu, ni = u.shape[0], i.shape[0]
    nu_al, ni_al = adj.shape
    u = jnp.pad(u, ((0, nu_al - nu), (0, 0)))
    i = jnp.pad(i, ((0, ni_al - ni), (0, 0)))
    u_acc = u * blend[0]
    i_acc = i * blend[0]
    for l in range(1, len(blend)):
        u_new = _adj_mm(adj, i)
        i_new = _adj_tmm(adj, u)
        u, i = u_new, i_new
        u_acc = u_acc + u * blend[l]
        i_acc = i_acc + i * blend[l]
    return u_acc[:nu], i_acc[:ni]


def propagate(u, i, conv, blend):
    """Symmetric-normalized LightGCN propagation; blended layer mean.

    ``conv`` is either the 5-tuple ``(rows, cols, vals, n_users, n_items)``
    (row-major edges; the item-side reduction then scatters UNSORTED
    destinations — XLA lowers that to a device SORT of every edge per SpMM,
    seconds per step at ML-20M scale) or the 8-tuple that additionally
    carries a column-sorted copy ``(…, rows_c, cols_c, vals_c)`` so BOTH
    reductions run as sorted segment sums (no sort, HBM-bound).  Trainers
    build the 8-tuple; the 5-tuple form is kept for small graphs/tests."""
    if len(conv) == 8:
        rows, cols, vals, n_users, n_items, rows_c, cols_c, vals_c = conv
    else:
        rows, cols, vals, n_users, n_items = conv
        rows_c = cols_c = vals_c = None
    if vals.shape[0] >= _SPMM_CHUNK_MIN:
        chunked = True

        def spmm(v, s_idx, d_idx, src, n_dst, srt):
            return _spmm_chunked(v, s_idx, d_idx, src, n_dst)
    else:
        chunked = False

        def spmm(v, s_idx, d_idx, src, n_dst, srt):
            return jax.ops.segment_sum(
                v[:, None] * src[s_idx], d_idx, num_segments=n_dst, indices_are_sorted=srt
            )

    sorted_form = cols_c is not None and not chunked
    u_acc = u * blend[0]
    i_acc = i * blend[0]
    for l in range(1, len(blend)):
        # the 8-tuple form guarantees row-major base edges (sorted user
        # destinations) and a column-sorted copy for the item direction;
        # the 5-tuple form makes no ordering promises
        u_new = spmm(vals, cols, rows, i, n_users, sorted_form)
        if sorted_form:
            i_new = spmm(vals_c, rows_c, cols_c, u, n_items, True)
        else:
            i_new = spmm(vals, rows, cols, u, n_items, False)
        u, i = u_new, i_new
        u_acc = u_acc + u * blend[l]
        i_acc = i_acc + i * blend[l]
    return u_acc, i_acc


def dense_adjacency_eligible(nnz: int, n_users: int, n_items: int, mesh=None) -> bool:
    """True when a graph should propagate through the dense bf16 adjacency:
    TPU backend, enough edges for the scatter cost to matter, and the
    (tile-aligned) dense matrix within the *per-device* HBM budget.

    With a mesh, the adjacency row-shards over the ``model`` axis
    (:func:`build_dense_adjacency`), so a catalog whose dense matrix is
    ``d_model``× the single-chip budget still propagates on the MXU instead
    of falling back to the ~30× slower segment-sum SpMM."""
    d = 1
    if mesh is not None and "model" in mesh.shape:
        d = mesh.shape["model"]
    return (
        jax.default_backend() == "tpu"
        and nnz >= _DENSE_ADJ_MIN_EDGES
        and n_users * n_items * 2 <= _DENSE_ADJ_MAX_BYTES * d
    )


def _build_adj_core(rows, cols, vals, nu, ni):
    return jnp.zeros((nu, ni), jnp.bfloat16).at[rows, cols].set(vals.astype(jnp.bfloat16))


_build_adj = jax.jit(_build_adj_core, static_argnames=("nu", "ni"))


def build_dense_adjacency(rows, cols, vals, n_users: int, n_items: int, mesh=None):
    """Dense bf16 adjacency with TILE-ALIGNED dims (16×128 for bf16).

    The build MUST be jit-compiled: an eager scatter returns a buffer in a
    non-canonical layout, and every later matmul then relayouts the
    multi-GB operand (HBM OOM); a compiled program's output uses the
    canonical layout.  Unaligned dims force the same relayout copy.

    With a mesh, the rows (users) shard over the ``model`` axis — each
    device holds a ``(nu_al / d_model, ni_al)`` tile-aligned block, and
    under ``jit`` GSPMD partitions :func:`propagate_dense` accordingly:
    ``adj @ i`` is a purely local matmul (row-sharded result), and
    ``adjᵀ @ u`` contracts the sharded axis, inserting one all-reduce of
    the small ``(ni, k)`` result per layer.
    """
    nu_mult = 16
    ni_al = -(-n_items // 128) * 128
    if mesh is not None and "model" in mesh.shape:
        from jax.sharding import NamedSharding, PartitionSpec as P

        d = mesh.shape["model"]
        nu_mult = 16 * d  # every shard stays sublane-aligned
        nu_al = -(-n_users // nu_mult) * nu_mult
        shard = NamedSharding(mesh, P("model", None))
        build = jax.jit(_build_adj_core, static_argnames=("nu", "ni"), out_shardings=shard)
        return build(rows, cols, vals, nu=nu_al, ni=ni_al)
    nu_al = -(-n_users // nu_mult) * nu_mult
    return _build_adj(rows, cols, vals, nu=nu_al, ni=ni_al)


def sorted_conv(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray, nu: int, ni: int):
    """Build the 8-tuple edge form: row-major base + a column-sorted copy,
    so BOTH propagate directions run as sorted segment sums."""
    order_c = np.argsort(cols, kind="stable")
    return (
        jnp.asarray(rows),
        jnp.asarray(cols),
        jnp.asarray(vals),
        nu,
        ni,
        jnp.asarray(rows[order_c]),
        jnp.asarray(cols[order_c]),
        jnp.asarray(vals[order_c]),
    )
