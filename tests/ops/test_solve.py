"""Blocked batched Cholesky solve (ops/solve.py) oracle tests."""

import numpy as np
import pytest

from lkpy_tpu.ops.solve import blocked_cholesky, blocked_spd_solve


def _spd(rng, B, K):
    M = rng.standard_normal((B, K, K)).astype(np.float32)
    return M @ np.transpose(M, (0, 2, 1)) + 10 * np.eye(K, dtype=np.float32)


@pytest.mark.parametrize("K", [8, 16, 64])
def test_cholesky_matches_numpy(K):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    A = _spd(rng, 5, K)
    L = np.asarray(blocked_cholesky(jnp.asarray(A)))
    ref = np.linalg.cholesky(A)
    np.testing.assert_allclose(L, ref, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("K", [8, 32, 64, 50])  # 50 exercises padding
def test_solve_matches_numpy(K):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    A = _spd(rng, 7, K)
    y = rng.standard_normal((7, K)).astype(np.float32)
    x = np.asarray(blocked_spd_solve(jnp.asarray(A), jnp.asarray(y)))
    ref = np.linalg.solve(A, y[..., None])[..., 0]
    np.testing.assert_allclose(x, ref, rtol=5e-4, atol=5e-4)
