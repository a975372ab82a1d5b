"""Oracle tests for the fused Pallas MIPS top-k kernel.

On the CPU test mesh the kernel runs in Pallas interpreter mode — the same
kernel body the TPU compiles (reference behavior: scorer + argtopn,
src/accel/data/sorting.rs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lkpy_tpu.ops.pallas_topk import MAX_FUSED_K, mips_topk


def _oracle(Q, I, k, i_bias=None, exclude=None):
    # same-precision oracle: f32 matmul like the kernel, then exact top-k
    S = np.asarray(jnp.dot(jnp.asarray(Q), jnp.asarray(I).T, preferred_element_type=jnp.float32))
    if i_bias is not None:
        S = S + i_bias[None, :]
    if exclude is not None:
        S[exclude != 0] = -np.inf
    vals, idx = jax.lax.top_k(jnp.asarray(S), k)
    return np.asarray(vals), np.asarray(idx)


@pytest.mark.parametrize(
    "B,N,D,k",
    [
        (37, 1000, 48, 10),
        (128, 513, 64, 20),
        (5, 100, 16, 7),
        (64, 2048, 32, MAX_FUSED_K),
    ],
)
def test_mips_topk_matches_oracle(B, N, D, k):
    rng = np.random.default_rng(B * 1000 + N)
    Q = rng.standard_normal((B, D)).astype(np.float32)
    I = rng.standard_normal((N, D)).astype(np.float32)
    vals, idx = mips_topk(Q, I, k)
    rv, ri = _oracle(Q, I, k)
    np.testing.assert_allclose(np.asarray(vals), rv, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), ri)


def test_mips_topk_bias_and_exclusion():
    rng = np.random.default_rng(7)
    B, N, D, k = 33, 777, 40, 12
    Q = rng.standard_normal((B, D)).astype(np.float32)
    I = rng.standard_normal((N, D)).astype(np.float32)
    bias = rng.standard_normal(N).astype(np.float32)
    excl = (rng.random((B, N)) < 0.2).astype(np.int8)
    vals, idx = mips_topk(Q, I, k, i_bias=bias, exclude=excl)
    rv, ri = _oracle(Q, I, k, i_bias=bias, exclude=excl)
    np.testing.assert_allclose(np.asarray(vals), rv, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), ri)
    # excluded items never appear
    got = np.asarray(idx)
    for b in range(B):
        assert not excl[b, got[b]].any()


def test_mips_topk_more_excluded_than_items():
    # every item excluded -> all slots padded
    rng = np.random.default_rng(3)
    B, N, D, k = 4, 50, 8, 5
    Q = rng.standard_normal((B, D)).astype(np.float32)
    I = rng.standard_normal((N, D)).astype(np.float32)
    excl = np.ones((B, N), dtype=np.int8)
    vals, idx = mips_topk(Q, I, k, exclude=excl)
    assert np.isneginf(np.asarray(vals)).all()


def test_mips_topk_k_cap():
    with pytest.raises(ValueError):
        mips_topk(np.zeros((4, 8), np.float32), np.zeros((16, 8), np.float32), MAX_FUSED_K + 1)


def test_retrieval_topk_dispatch():
    from lkpy_tpu.ops.topk import retrieval_topk

    rng = np.random.default_rng(11)
    Q = rng.standard_normal((9, 24)).astype(np.float32)
    I = rng.standard_normal((300, 24)).astype(np.float32)
    bias = rng.standard_normal(300).astype(np.float32)
    vals, idx = retrieval_topk(jnp.asarray(Q), jnp.asarray(I), 5, i_bias=jnp.asarray(bias))
    rv, ri = _oracle(Q, I, 5, i_bias=bias)
    np.testing.assert_allclose(np.asarray(vals), rv, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), ri)


def test_approx_retrieval_matches_exact():
    """The chunked approx_max_k serving path (ops/topk.py::_approx_retrieval)
    agrees with exact top-k (CPU backends implement approx_max_k exactly;
    TPU recall@100 = 0.997 measured at recall_target=0.99)."""
    import jax.numpy as jnp
    import numpy as np

    from lkpy_tpu.ops.topk import _approx_retrieval

    rng = np.random.default_rng(3)
    items = jnp.asarray(rng.standard_normal((4096, 16)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    v, i = _approx_retrieval(q, items, items[:, 0] * 0.0, 10, 32, 0.99, False)
    import jax

    ev, ei = jax.lax.top_k(jnp.dot(q, items.T), 10)
    recall = np.mean([len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(np.asarray(i), np.asarray(ei))])
    assert recall >= 0.95
    # scores of returned items are genuine dot products
    np.testing.assert_allclose(
        np.asarray(v[0]),
        np.asarray(jnp.dot(q[0], items.T))[np.asarray(i[0])],
        rtol=1e-5,
    )


def test_approx_retrieval_bias_and_padding():
    import jax.numpy as jnp
    import numpy as np

    from lkpy_tpu.ops.topk import _approx_retrieval

    rng = np.random.default_rng(4)
    items = jnp.asarray(rng.standard_normal((1024, 8)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(1024).astype(np.float32) * 10)
    q = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    v, i = _approx_retrieval(q, items, bias, 5, 16, 0.99, True)
    scores = np.asarray(jnp.dot(q, items.T) + bias[None, :])
    expect = np.argsort(-scores, axis=1)[:, :5]
    hit = np.mean([len(set(a.tolist()) & set(b.tolist())) / 5 for a, b in zip(np.asarray(i), expect)])
    assert hit >= 0.9
