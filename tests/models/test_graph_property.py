"""Graph propagation property tests: the dense-adjacency and chunked SpMM
forms must agree with a numpy oracle of LightGCN propagation on random
bipartite graphs (`ops/graph.py`)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import jax.numpy as jnp

from lkpy_tpu.ops import graph as g

FAST = settings(max_examples=20, deadline=None)


@st.composite
def graphs(draw):
    seed = draw(st.integers(0, 2**31 - 1))
    nu = draw(st.integers(2, 20))
    ni = draw(st.integers(2, 25))
    k = draw(st.sampled_from([2, 4, 8]))
    layers = draw(st.integers(1, 3))
    rng = np.random.default_rng(seed)
    nnz = rng.integers(1, nu * ni + 1)
    cells = {(rng.integers(0, nu), rng.integers(0, ni)) for _ in range(nnz)}
    rows = np.asarray([c[0] for c in cells], np.int32)
    cols = np.asarray([c[1] for c in cells], np.int32)
    vals = rng.uniform(0.1, 1.0, len(cells)).astype(np.float32)
    u = rng.standard_normal((nu, k)).astype(np.float32)
    i = rng.standard_normal((ni, k)).astype(np.float32)
    blend = rng.uniform(0.1, 1.0, layers + 1).astype(np.float32)
    return rows, cols, vals, nu, ni, u, i, blend


def oracle(rows, cols, vals, nu, ni, u, i, blend):
    A = np.zeros((nu, ni), np.float64)
    A[rows, cols] = vals
    uc, ic = u.astype(np.float64), i.astype(np.float64)
    u_acc = uc * blend[0]
    i_acc = ic * blend[0]
    for l in range(1, len(blend)):
        u_new = A @ ic
        i_new = A.T @ uc
        uc, ic = u_new, i_new
        u_acc = u_acc + uc * blend[l]
        i_acc = i_acc + ic * blend[l]
    return u_acc, i_acc


@FAST
@given(graphs())
def test_segment_propagate_matches_oracle(data):
    rows, cols, vals, nu, ni, u, i, blend = data
    conv = (jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals), nu, ni)
    gu, gi = g.propagate(jnp.asarray(u), jnp.asarray(i), conv, jnp.asarray(blend))
    wu, wi = oracle(rows, cols, vals, nu, ni, u, i, blend)
    np.testing.assert_allclose(np.asarray(gu), wu, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gi), wi, rtol=1e-3, atol=1e-4)


@FAST
@given(graphs())
def test_sorted_conv_matches_plain(data):
    rows, cols, vals, nu, ni, u, i, blend = data
    plain = (jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals), nu, ni)
    srt = g.sorted_conv(rows, cols, vals, nu, ni)
    pu, pi = g.propagate(jnp.asarray(u), jnp.asarray(i), plain, jnp.asarray(blend))
    su, si = g.propagate(jnp.asarray(u), jnp.asarray(i), srt, jnp.asarray(blend))
    np.testing.assert_allclose(np.asarray(su), np.asarray(pu), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(si), np.asarray(pi), rtol=1e-4, atol=1e-5)


@FAST
@given(graphs())
def test_dense_adjacency_matches_oracle(data):
    rows, cols, vals, nu, ni, u, i, blend = data
    adj = g.build_dense_adjacency(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals), nu, ni)
    gu, gi = g.propagate_dense(jnp.asarray(u), jnp.asarray(i), adj, jnp.asarray(blend))
    # the dense path quantizes the adjacency AND each layer's embedding
    # inputs to bf16 (f32 accumulation) — the oracle mirrors that exactly
    import ml_dtypes

    def bf(x):
        return x.astype(ml_dtypes.bfloat16).astype(np.float64)

    A = np.zeros((nu, ni), np.float64)
    A[rows, cols] = bf(vals)
    uc, ic = u.astype(np.float64), i.astype(np.float64)
    wu = uc * blend[0]
    wi = ic * blend[0]
    for l in range(1, len(blend)):
        u_new = A @ bf(ic.astype(np.float32))
        i_new = A.T @ bf(uc.astype(np.float32))
        uc, ic = u_new, i_new
        wu = wu + uc * blend[l]
        wi = wi + ic * blend[l]
    np.testing.assert_allclose(np.asarray(gu), wu, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gi), wi, rtol=5e-3, atol=5e-3)


@FAST
@given(graphs())
def test_propagate_linearity(data):
    """Propagation is linear in the embeddings: P(2u, 2i) = 2 P(u, i)."""
    rows, cols, vals, nu, ni, u, i, blend = data
    conv = (jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals), nu, ni)
    u1, i1 = g.propagate(jnp.asarray(u), jnp.asarray(i), conv, jnp.asarray(blend))
    u2, i2 = g.propagate(jnp.asarray(2 * u), jnp.asarray(2 * i), conv, jnp.asarray(blend))
    np.testing.assert_allclose(np.asarray(u2), 2 * np.asarray(u1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i2), 2 * np.asarray(i1), rtol=1e-4, atol=1e-5)
