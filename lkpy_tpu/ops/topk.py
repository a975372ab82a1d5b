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

__all__ = ["masked_top_k", "top_n_indices", "argtopn"]

_NEG_INF = jnp.float32(-jnp.inf)


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
