import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sps

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.sampling import DeviceCSRIndex, csr_contains, sample_negatives


@pytest.fixture
def csr():
    mat = sps.random(50, 100, density=0.1, random_state=42, format="csr")
    return CSR.from_scipy(mat)


def test_contains_matches_scipy(csr):
    index = DeviceCSRIndex.from_csr(csr)
    sp = csr.to_scipy(structural=True)
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 50, 500).astype(np.int32)
    cols = rng.integers(0, 100, 500).astype(np.int32)
    got = np.asarray(csr_contains(index, jnp.asarray(rows), jnp.asarray(cols)))
    expected = np.asarray(sp[rows, cols]).ravel() > 0
    np.testing.assert_array_equal(got, expected)


def test_contains_known_positives(csr):
    index = DeviceCSRIndex.from_csr(csr)
    coo = csr.to_coo()
    got = np.asarray(csr_contains(index, jnp.asarray(coo.row), jnp.asarray(coo.col)))
    assert got.all()


def test_sample_negatives_verified(csr):
    index = DeviceCSRIndex.from_csr(csr)
    key = jax.random.key(42)
    rows = jnp.asarray(np.arange(50, dtype=np.int32))
    negs = np.asarray(sample_negatives(key, index, rows, n=8))
    sp = csr.to_scipy(structural=True)
    for r in range(50):
        vals = np.asarray(sp[[r], negs[r]]).ravel()
        assert (vals == 0).all()


def test_sample_negatives_popularity(csr):
    index = DeviceCSRIndex.from_csr(csr)
    key = jax.random.key(7)
    rows = jnp.asarray(np.zeros(2000, dtype=np.int32))
    negs = np.asarray(sample_negatives(key, index, rows, n=1, weighting="popularity"))
    # sampled items should follow popularity: compare frequency of top columns
    col_pop = np.bincount(csr.colind, minlength=100)
    top = np.argsort(-col_pop)[:10]
    freq = np.isin(negs, top).mean()
    assert freq > np.isin(np.arange(100), top).mean()  # more than uniform


def test_bloom_index_no_false_negatives(csr):
    """Every true interaction must hit in the Bloom filter — the sampler's
    exactly-verified-negatives guarantee depends on it."""
    from lkpy_tpu.ops.sampling import _bloom_bit_positions

    index = DeviceCSRIndex.from_csr(csr)
    assert index.bloom is not None and index.log2_bits >= 10
    coo = csr.to_coo()
    words = np.asarray(index.bloom)
    for h in _bloom_bit_positions(
        coo.row.astype(np.uint32), coo.col.astype(np.uint32), index.log2_bits, np
    ):
        bits = (words[np.asarray(h) >> 5] >> (np.asarray(h) & np.uint32(31))) & np.uint32(1)
        assert bits.all()


def test_bloom_sampler_negatives_exactly_verified(csr):
    """The bloom-verified sampler must never emit a true positive — dense
    rows included (they exercise the fallback-pick branch)."""
    index = DeviceCSRIndex.from_csr(csr)
    assert index.bloom is not None
    sp = csr.to_scipy(structural=True)
    key = jax.random.key(3)
    rows = jnp.asarray(np.repeat(np.arange(50, dtype=np.int32), 20))
    negs = np.asarray(sample_negatives(key, index, rows, n=4))
    rr = np.repeat(np.arange(50), 20)
    bad = np.asarray(sp[np.repeat(rr, 4), negs.ravel()]).ravel() > 0
    assert not bad.any()


def test_bloom_vs_exact_same_distribution(csr):
    """Bloom and exact samplers draw from (nearly) the same distribution —
    the bloom's ~1.5% false positives only exclude a pseudo-random sliver."""
    exact = DeviceCSRIndex.from_csr(csr, bloom=False)
    bloom = DeviceCSRIndex.from_csr(csr, bloom=True)
    assert exact.bloom is None
    key = jax.random.key(11)
    rows = jnp.asarray(np.zeros(4000, dtype=np.int32))
    n_e = np.asarray(sample_negatives(key, exact, rows, n=1)).ravel()
    n_b = np.asarray(sample_negatives(key, bloom, rows, n=1)).ravel()
    # coarse distribution agreement: mean item id within a few percent
    assert abs(n_e.mean() - n_b.mean()) < 6.0
