"""
Segment reductions — the TPU-native replacement for the reference's
row-looping accumulations (e.g. bias model sums, reference:
src/lenskit/basic/bias.py:84 ``np.add.at`` loops).

All functions are jit-compatible with static ``num_segments``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["segment_sum", "segment_count", "segment_mean"]


def segment_sum(values: jax.Array, segments: jax.Array, num_segments: int) -> jax.Array:
    """Sum ``values`` by segment ID."""
    return jax.ops.segment_sum(values, segments, num_segments=num_segments)


def segment_count(segments: jax.Array, num_segments: int) -> jax.Array:
    """Count entries per segment."""
    return jax.ops.segment_sum(jnp.ones_like(segments, dtype=jnp.float32), segments, num_segments=num_segments)


def segment_mean(
    values: jax.Array, segments: jax.Array, num_segments: int, *, damping: float = 0.0
) -> jax.Array:
    """
    (Damped) per-segment mean: sum / (count + damping); 0 for empty segments.
    Matches the reference bias damping semantics (reference: basic/bias.py:84).
    """
    sums = segment_sum(values, segments, num_segments)
    counts = segment_count(segments, num_segments)
    denom = counts + damping
    return jnp.where(denom > 0, sums / jnp.maximum(denom, 1e-12), 0.0)
