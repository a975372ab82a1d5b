"""
FunkSVD featurewise SGD kernel.

TPU-native replacement for the reference's sequential per-sample SGD
(reference: src/accel/funksvd.rs:66-128).  Exact-order sequential SGD is
unvectorizable; this kernel trains each feature with *minibatch* SGD —
per-batch errors, segment-summed gradients, one update per batch — keeping
the reference's featurewise structure, residual estimates, trailing-value
term, and clamping.  Documented deviation (SURVEY.md §2.2: "exact-order SGD
not TPU-idiomatic").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["train_feature"]


@partial(jax.jit, static_argnames=("n_users", "n_items", "epochs", "batch"))
def train_feature(
    users: jax.Array,  # (N,) int32 (shuffled, padded with -1 -> masked)
    items: jax.Array,  # (N,) int32
    ratings: jax.Array,  # (N,) f32
    mask: jax.Array,  # (N,) f32 1/0 padding mask
    est: jax.Array,  # (N,) f32 baseline + previous features
    u_col: jax.Array,  # (n_users,) f32 current feature column
    i_col: jax.Array,  # (n_items,) f32
    trail: jax.Array,  # scalar f32
    lr: float,
    reg: float,
    rmin: float,
    rmax: float,
    n_users: int,
    n_items: int,
    epochs: int,
    batch: int,
):
    """Train one latent feature; returns (u_col, i_col, final rmse)."""
    N = users.shape[0]
    n_batches = N // batch
    us = users.reshape(n_batches, batch)
    its = items.reshape(n_batches, batch)
    rs = ratings.reshape(n_batches, batch)
    ms = mask.reshape(n_batches, batch)
    es = est.reshape(n_batches, batch)

    def batch_step(carry, xs):
        u_col, i_col = carry
        bu, bi, br, bm, be = xs
        uf = u_col[bu]
        if_ = i_col[bi]
        pred = jnp.clip(be + uf * if_ + trail, rmin, rmax)
        err = (br - pred) * bm
        du = jax.ops.segment_sum((err * if_ - reg * uf * bm), bu, num_segments=n_users)
        di = jax.ops.segment_sum((err * uf - reg * if_ * bm), bi, num_segments=n_items)
        u_col = u_col + lr * du
        i_col = i_col + lr * di
        sse = jnp.sum(err * err)
        return (u_col, i_col), sse

    def epoch_body(_, carry):
        (u_col, i_col), _sse = carry
        (u_col, i_col), sses = jax.lax.scan(batch_step, (u_col, i_col), (us, its, rs, ms, es))
        return (u_col, i_col), jnp.sum(sses)

    (u_col, i_col), sse = jax.lax.fori_loop(
        0, epochs, epoch_body, ((u_col, i_col), jnp.float32(0.0))
    )
    n_real = jnp.maximum(jnp.sum(mask), 1.0)
    return u_col, i_col, jnp.sqrt(sse / n_real)
