"""
Top-k utilities — replacement for the reference's heap-based accumulators and
``argtopn`` (reference: src/accel/knn/accum.rs, src/accel/data/sorting.rs).

On TPU, top-k is ``jax.lax.top_k`` (sorting-network based); masked variants
push invalid entries to −inf first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["masked_top_k", "top_n_indices", "argtopn", "retrieval_topk"]

_NEG_INF = jnp.float32(-jnp.inf)

#: catalog size above which the fused Pallas MIPS kernel beats the XLA
#: matmul+top_k path on TPU (measured crossover ~200k items on v5e; see
#: lkpy_tpu/ops/pallas_topk.py)
FUSED_RETRIEVAL_MIN_ITEMS = 200_000


def retrieval_topk(
    queries: jax.Array,
    items: jax.Array,
    k: int,
    *,
    i_bias: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """
    Exact top-k maximum-inner-product retrieval: ``queries @ items.T``.

    Dispatches by catalog size: small catalogs use the XLA matmul+top_k
    (which XLA fuses on-chip and is fastest there); large catalogs use the
    fused Pallas streaming kernel that never materializes the score matrix
    in HBM.  Returns (scores (B, k) descending, item indices (B, k)).
    """
    from lkpy_tpu.ops.pallas_topk import MAX_FUSED_K, mips_topk

    n_items = items.shape[0]
    if jax.default_backend() == "tpu" and n_items >= FUSED_RETRIEVAL_MIN_ITEMS and k <= MAX_FUSED_K:
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
