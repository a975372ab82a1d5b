"""Oracle tests for the Pallas batched SPD solver (ALS hot kernel).

On the CPU test mesh the kernel runs in Pallas interpreter mode — the same
kernel body the TPU compiles (reference contract: LAPACK ``sposv``,
src/accel/als/solve.rs:47).
"""

import numpy as np
import pytest
import scipy.linalg as sla

import jax.numpy as jnp

from lkpy_tpu.ops.als import batched_spd_solve
from lkpy_tpu.ops.pallas_solve import spd_solve


def _spd_batch(rng, B, k, reg=2.0):
    X = rng.standard_normal((B, k, k)).astype(np.float32)
    A = X @ X.transpose(0, 2, 1) + reg * np.eye(k, dtype=np.float32)
    y = rng.standard_normal((B, k)).astype(np.float32)
    return A, y


def _oracle(A, y):
    return np.stack([sla.cho_solve(sla.cho_factor(A[i]), y[i]) for i in range(len(y))])


@pytest.mark.parametrize("B,k", [(37, 64), (100, 50), (8, 8), (5, 96), (1, 32)])
def test_spd_solve_matches_lapack(B, k):
    rng = np.random.default_rng(B * 100 + k)
    A, y = _spd_batch(rng, B, k)
    x = np.asarray(spd_solve(jnp.asarray(A), jnp.asarray(y)))
    ref = _oracle(A, y)
    err = np.abs(x - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert err < 2e-3


def test_spd_solve_ill_conditioned():
    # wide eigenvalue spread (like a popular-item Gram vs damped reg)
    rng = np.random.default_rng(9)
    B, k = 20, 64
    A, y = _spd_batch(rng, B, k, reg=0.01)
    scale = np.logspace(0, 3, B).astype(np.float32)
    A = A * scale[:, None, None]
    x = np.asarray(spd_solve(jnp.asarray(A), jnp.asarray(y)))
    ref = _oracle(A, y)
    resid = np.abs(np.einsum("bij,bj->bi", A, x) - y).max()
    resid_ref = np.abs(np.einsum("bij,bj->bi", A, ref) - y).max()
    assert resid < max(10 * resid_ref, 1e-2)


def test_batched_spd_solve_dispatch():
    # off-TPU this takes the Cholesky path; results must agree with the kernel
    rng = np.random.default_rng(3)
    A, y = _spd_batch(rng, 16, 40)
    a = np.asarray(batched_spd_solve(jnp.asarray(A), jnp.asarray(y)))
    b = np.asarray(spd_solve(jnp.asarray(A), jnp.asarray(y)))
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4)
