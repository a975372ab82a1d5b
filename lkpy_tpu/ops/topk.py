"""
Top-k utilities — replacement for the reference's heap-based accumulators and
``argtopn`` (reference: src/accel/knn/accum.rs, src/accel/data/sorting.rs).

On TPU, top-k is ``jax.lax.top_k`` (sorting-network based); masked variants
push invalid entries to −inf first.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["masked_top_k", "top_n_indices", "argtopn", "retrieval_topk"]

_NEG_INF = jnp.float32(-jnp.inf)

#: catalog size above which the fused Pallas MIPS kernel beats the XLA
#: matmul+top_k path on TPU (measured crossover ~200k items on v5e; see
#: lkpy_tpu/ops/pallas_topk.py)
FUSED_RETRIEVAL_MIN_ITEMS = 200_000


@partial(jax.jit, static_argnames=("k", "chunk", "recall_target", "biased"))
def _approx_retrieval(queries, items, i_bias, k: int, chunk: int, recall_target: float, biased: bool):
    """B-chunked matmul + hardware TopK (``jax.lax.approx_max_k``).

    The score matrix only ever exists one (chunk, N) slab at a time, and the
    O(N) partial reduction replaces the sort-based exact top_k — measured
    110.5k qps vs 6.2k for the full-matrix exact path at N=500k, B=4096,
    k=100 on v5e (recall@100 = 0.997 at recall_target=0.99).
    """

    def body(_, qc):
        s = jnp.dot(qc, items.T, preferred_element_type=jnp.float32)
        if biased:
            s = s + i_bias[None, :]
        v, i = jax.lax.approx_max_k(s, k, recall_target=recall_target, aggregate_to_topk=True)
        return None, (v, i)

    B = queries.shape[0]
    _, (v, i) = jax.lax.scan(body, None, queries.reshape(B // chunk, chunk, -1))
    return v.reshape(B, k), i.reshape(B, k).astype(jnp.int32)


_warned_approx = False


def _warn_approx_once(n_items: int, recall_target: float) -> None:
    """Warn (once) that retrieval switched to approximate hardware TopK —
    the reference's batch recommend is exact, so results may differ on large
    catalogs; ``settings.serving.exact = true`` pins exact globally."""
    global _warned_approx
    if not _warned_approx:
        _warned_approx = True
        from lkpy_tpu.logging import get_logger

        get_logger(__name__).warning(
            "using TPU hardware TopK (approximate) retrieval; "
            "set serving.exact=true (or exact=True) for reference-exact results",
            n_items=n_items,
            recall_target=recall_target,
        )


def retrieval_topk(
    queries: jax.Array,
    items: jax.Array,
    k: int,
    *,
    i_bias: jax.Array | None = None,
    exact: bool = True,
    recall_target: float = 0.99,
    chunk: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """
    Top-k maximum-inner-product retrieval: ``queries @ items.T``.

    Dispatch (all measured on v5e):

    - small catalogs — XLA matmul+top_k (fuses on-chip, fastest there);
    - large catalogs, ``exact=False`` (explicit opt-in) — B-chunked matmul +
      the TPU hardware TopK (:func:`_approx_retrieval`); ~18× the exact
      path's throughput with recall ≥ ``recall_target`` (0.997 measured at
      0.99); a log line records the switch the first time it is taken;
    - large catalogs, ``exact=True`` (default), small k — the fused Pallas
      streaming kernel (never materializes scores in HBM);
    - otherwise the exact XLA path.

    Returns (scores (B, k) descending, item indices (B, k)).
    """
    from lkpy_tpu.ops.pallas_topk import MAX_FUSED_K, mips_topk

    n_items = items.shape[0]
    large = n_items >= FUSED_RETRIEVAL_MIN_ITEMS
    if jax.default_backend() == "tpu" and large:
        if not exact:
            _warn_approx_once(n_items, recall_target)
            B = queries.shape[0]
            chunk = min(chunk, B)
            pad = (-B) % chunk
            q = jnp.pad(queries, ((0, pad), (0, 0))) if pad else queries
            bias = items[:, 0] * 0.0 if i_bias is None else jnp.asarray(i_bias, jnp.float32)
            v, i = _approx_retrieval(q, items, bias, k, chunk, recall_target, i_bias is not None)
            return v[:B], i[:B]
        if k <= MAX_FUSED_K:
            return mips_topk(queries, items, k, i_bias=i_bias)
    scores = jnp.dot(queries, items.T, preferred_element_type=jnp.float32)
    if i_bias is not None:
        scores = scores + i_bias[None, :]
    return jax.lax.top_k(scores, k)


def masked_top_k(values: jax.Array, mask: jax.Array | None, k: int) -> tuple[jax.Array, jax.Array]:
    """
    Top-k over the last axis with a validity mask.

    Returns (values, indices); masked-out or NaN entries are −inf and sort
    last.  jit-compatible; ``k`` static.
    """
    v = jnp.where(jnp.isnan(values), _NEG_INF, values)
    if mask is not None:
        v = jnp.where(mask, v, _NEG_INF)
    return jax.lax.top_k(v, k)


def top_n_indices(scores: jax.Array, n: int) -> jax.Array:
    """Indices of the top-n scores (NaN treated as −inf)."""
    _, idx = masked_top_k(scores, None, n)
    return idx


def argtopn(scores: np.ndarray, n: int | None = None) -> np.ndarray:
    """
    Host-side argtopn matching the reference's ``_accel.data.argtopn``
    (reference: src/accel/data/sorting.rs): indices of top-n by descending
    score, NaNs excluded, ties broken by position (stable).
    """
    scores = np.asarray(scores)
    valid = ~np.isnan(scores)
    k = int(valid.sum())
    if n is not None and n >= 0:
        k = min(k, n)
    order = np.argsort(-np.where(valid, scores, -np.inf), kind="stable")
    return order[:k]
