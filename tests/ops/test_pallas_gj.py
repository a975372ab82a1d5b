"""
Blocked batch-on-lanes Gauss-Jordan solver (lkpy_tpu.ops.pallas_gj).

The round-4 ALS solve kernel (reference analog: per-row LAPACK ``sposv``,
src/accel/als/solve.rs:47).  On CPU these run the Pallas interpreter —
small shapes only; the TPU lane (tests/tpu) exercises the compiled kernel.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lkpy_tpu.ops.pallas_gj import spd_solve_lanes, spd_solve_lanes_chunked


def _spd_batch(rng, B, k, jitter=10.0):
    M = rng.normal(size=(B, k, k)).astype(np.float32)
    A = np.einsum("bij,bkj->bik", M, M) + jitter * np.eye(k, dtype=np.float32)
    y = rng.normal(size=(B, k)).astype(np.float32)
    return A, y


@pytest.mark.parametrize("k", [8, 16, 64])
def test_matches_numpy_solve(k):
    rng = np.random.default_rng(42)
    B = 160
    A, y = _spd_batch(rng, B, k)
    x = spd_solve_lanes(jnp.asarray(np.transpose(A, (1, 2, 0))), jnp.asarray(y.T), bt=128)
    ref = np.linalg.solve(A, y[:, :, None])[:, :, 0]
    np.testing.assert_allclose(np.asarray(x).T, ref, rtol=0, atol=2e-4 * np.abs(ref).max())


def test_rejects_non_multiple_of_8():
    A = jnp.eye(10)[:, :, None]
    with pytest.raises(ValueError, match="multiple of 8"):
        spd_solve_lanes(A, jnp.ones((10, 1)))


def test_batch_padding_lanes_are_independent():
    """B not a multiple of bt: padded lanes solve singular systems but must
    not contaminate real lanes (the kernel has no cross-lane ops)."""
    rng = np.random.default_rng(3)
    B, k = 37, 16
    A, y = _spd_batch(rng, B, k)
    x = spd_solve_lanes(jnp.asarray(np.transpose(A, (1, 2, 0))), jnp.asarray(y.T), bt=128)
    ref = np.linalg.solve(A, y[:, :, None])[:, :, 0]
    got = np.asarray(x).T
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, ref, atol=2e-4 * np.abs(ref).max())


def test_chunked_matches_flat():
    rng = np.random.default_rng(7)
    C, B, k = 3, 128, 24
    A, y = _spd_batch(rng, C * B, k)
    A_l = jnp.asarray(np.transpose(A.reshape(C, B, k, k), (0, 2, 3, 1)))
    y_l = jnp.asarray(np.transpose(y.reshape(C, B, k), (0, 2, 1)))
    x = spd_solve_lanes_chunked(A_l, y_l)
    ref = np.linalg.solve(A, y[:, :, None])[:, :, 0].reshape(C, B, k)
    np.testing.assert_allclose(
        np.transpose(np.asarray(x), (0, 2, 1)), ref, atol=2e-4 * np.abs(ref).max()
    )


def test_ill_conditioned_still_accurate():
    """Condition number ~1e4 (heavier than ALS normal equations): the
    no-pivoting SPD contract must still deliver usable accuracy."""
    rng = np.random.default_rng(11)
    B, k = 16, 32
    Q, _ = np.linalg.qr(rng.normal(size=(k, k)))
    d = np.logspace(0, 4, k)
    A = np.repeat((Q * d) @ Q.T[None] if False else ((Q * d) @ Q.T)[None], B, axis=0).astype(
        np.float32
    )
    y = rng.normal(size=(B, k)).astype(np.float32)
    x = spd_solve_lanes(jnp.asarray(np.transpose(A, (1, 2, 0))), jnp.asarray(y.T), bt=128)
    ref = np.linalg.solve(A.astype(np.float64), y[:, :, None])[:, :, 0]
    rel = np.abs(np.asarray(x).T - ref).max() / np.abs(ref).max()
    assert rel < 1e-2, rel
