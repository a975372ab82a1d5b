"""Property tests for the batched solvers and ALS bucket solves against
numpy oracles (reference semantics: src/accel/als/explicit.rs:81
normal-equation row solves)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import jax.numpy as jnp

from lkpy_tpu.ops.als import (
    batched_spd_solve,
    implicit_otor,
    solve_explicit_bucket,
    solve_implicit_bucket,
)

FAST = settings(max_examples=25, deadline=None)


@st.composite
def spd_systems(draw):
    b = draw(st.integers(1, 6))
    k = draw(st.sampled_from([2, 3, 5, 8, 16]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((b, k, k)).astype(np.float32)
    A = np.einsum("bij,bkj->bik", M, M) + 0.5 * np.eye(k, dtype=np.float32)
    y = rng.standard_normal((b, k)).astype(np.float32)
    return A, y


@FAST
@given(spd_systems())
def test_batched_spd_solve_matches_numpy(sys_):
    A, y = sys_
    got = np.asarray(batched_spd_solve(jnp.asarray(A), jnp.asarray(y)))
    want = np.linalg.solve(A.astype(np.float64), y.astype(np.float64)[..., None])[..., 0]
    # residual check is conditioning-independent: ||A x - y|| small
    resid = np.einsum("bij,bj->bi", A, got) - y
    assert np.abs(resid).max() < 1e-2
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


@st.composite
def bucket_problems(draw):
    seed = draw(st.integers(0, 2**31 - 1))
    B = draw(st.integers(1, 5))
    P = draw(st.sampled_from([2, 4, 8]))
    n_items = draw(st.integers(P, 30))
    k = draw(st.sampled_from([3, 8]))
    rng = np.random.default_rng(seed)
    cols = rng.integers(0, n_items, (B, P)).astype(np.int32)
    lens = rng.integers(1, P + 1, B)
    mask = np.arange(P)[None, :] < lens[:, None]
    vals = rng.standard_normal((B, P)).astype(np.float32) * mask
    right = rng.standard_normal((n_items, k)).astype(np.float32)
    return cols, vals, mask, right


@FAST
@given(bucket_problems(), st.floats(0.05, 1.0))
def test_solve_explicit_bucket_oracle(prob, reg):
    """Each row solve must equal the numpy normal-equation solution
    (A = GᵀG + reg·n·I over the MASKED entries; y = Gᵀ r)."""
    cols, vals, mask, right = prob
    got = np.asarray(
        solve_explicit_bucket(
            jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(mask), jnp.asarray(right), jnp.float32(reg)
        )
    )
    k = right.shape[1]
    for b in range(cols.shape[0]):
        G = right[cols[b][mask[b]]]
        r = vals[b][mask[b]]
        n = mask[b].sum()
        A = G.T @ G + reg * n * np.eye(k, dtype=np.float32)
        want = np.linalg.solve(A.astype(np.float64), (G.T @ r).astype(np.float64))
        np.testing.assert_allclose(got[b], want, rtol=5e-2, atol=5e-3)


@FAST
@given(bucket_problems(), st.floats(0.05, 1.0), st.floats(1.0, 50.0))
def test_solve_implicit_bucket_oracle(prob, reg, weight):
    """Hu-et-al. weighted solve: A = YᵀY + λI + Σ c·g gᵀ, y = Σ (c+1)·g
    over the masked history (reference: als/_implicit.py:24-51)."""
    cols, _vals, mask, right = prob
    conf = (np.abs(_vals) * weight).astype(np.float32) * mask
    otor = np.asarray(implicit_otor(jnp.asarray(right), jnp.float32(reg)))
    got = np.asarray(
        solve_implicit_bucket(
            jnp.asarray(cols), jnp.asarray(conf), jnp.asarray(mask), jnp.asarray(right), jnp.asarray(otor)
        )
    )
    k = right.shape[1]
    for b in range(cols.shape[0]):
        G = right[cols[b][mask[b]]]
        c = conf[b][mask[b]]
        A = otor + (G.T * c) @ G
        y = G.T @ (c + 1.0)
        want = np.linalg.solve(A.astype(np.float64), y.astype(np.float64))
        np.testing.assert_allclose(got[b], want, rtol=5e-2, atol=5e-3)


@FAST
@given(st.integers(0, 2**31 - 1), st.sampled_from([2, 5, 8, 16]), st.floats(0.01, 2.0))
def test_implicit_otor_formula(seed, k, reg):
    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((12, k)).astype(np.float32)
    got = np.asarray(implicit_otor(jnp.asarray(Y), jnp.float32(reg)))
    np.testing.assert_allclose(got, Y.T @ Y + reg * np.eye(k), rtol=1e-4, atol=1e-4)
