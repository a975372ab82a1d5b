"""Segment-reduction op oracles (reference analog: bias accumulation loops,
src/lenskit/basic/bias.py:84)."""

import numpy as np
import jax.numpy as jnp

from lkpy_tpu.ops.segment import segment_count, segment_mean, segment_sum


def test_segment_sum_matches_bincount():
    rng = np.random.default_rng(0)
    segs = rng.integers(0, 20, 500).astype(np.int32)
    vals = rng.normal(size=500).astype(np.float32)
    got = np.asarray(segment_sum(jnp.asarray(vals), jnp.asarray(segs), 20))
    exp = np.bincount(segs, weights=vals, minlength=20)
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_segment_count_and_empty_segments():
    segs = jnp.asarray(np.array([0, 0, 2], dtype=np.int32))
    counts = np.asarray(segment_count(segs, 4))
    np.testing.assert_array_equal(counts, [2, 0, 1, 0])


def test_segment_mean_damping():
    segs = jnp.asarray(np.array([0, 0, 1], dtype=np.int32))
    vals = jnp.asarray(np.array([2.0, 4.0, 6.0], dtype=np.float32))
    # undamped means
    m0 = np.asarray(segment_mean(vals, segs, 3))
    np.testing.assert_allclose(m0, [3.0, 6.0, 0.0])
    # damping 1: sum/(count+1) — the reference's damped bias semantics
    m1 = np.asarray(segment_mean(vals, segs, 3, damping=1.0))
    np.testing.assert_allclose(m1, [6.0 / 3, 6.0 / 2, 0.0])


def test_segment_mean_empty_is_zero():
    segs = jnp.asarray(np.array([1], dtype=np.int32))
    vals = jnp.asarray(np.array([5.0], dtype=np.float32))
    m = np.asarray(segment_mean(vals, segs, 3))
    np.testing.assert_allclose(m, [0.0, 5.0, 0.0])


# ---- property forms (round 5) ---------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def segmented_values(draw):
    seed = draw(st.integers(0, 2**31 - 1))
    n = draw(st.integers(0, 200))
    n_seg = draw(st.integers(1, 20))
    rng = np.random.default_rng(seed)
    segs = rng.integers(0, n_seg, n).astype(np.int32)
    vals = rng.standard_normal(n).astype(np.float32)
    return vals, segs, n_seg


@settings(max_examples=40, deadline=None)
@given(segmented_values())
def test_segment_sum_property(data):
    vals, segs, n_seg = data
    got = np.asarray(segment_sum(jnp.asarray(vals), jnp.asarray(segs), n_seg))
    want = np.bincount(segs, weights=vals.astype(np.float64), minlength=n_seg)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@settings(max_examples=40, deadline=None)
@given(segmented_values())
def test_segment_count_property(data):
    vals, segs, n_seg = data
    got = np.asarray(segment_count(jnp.asarray(segs), n_seg))
    np.testing.assert_array_equal(got, np.bincount(segs, minlength=n_seg))


@settings(max_examples=40, deadline=None)
@given(segmented_values(), st.floats(0.0, 20.0))
def test_segment_mean_damping_property(data, damping):
    vals, segs, n_seg = data
    got = np.asarray(
        segment_mean(jnp.asarray(vals), jnp.asarray(segs), n_seg, damping=damping)
    )
    cnt = np.bincount(segs, minlength=n_seg)
    tot = np.bincount(segs, weights=vals.astype(np.float64), minlength=n_seg)
    want = tot / np.maximum(cnt + damping, 1e-38)
    if damping == 0.0:
        want = np.where(cnt > 0, tot / np.maximum(cnt, 1), 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
