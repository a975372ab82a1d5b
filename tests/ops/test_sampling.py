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
