"""
Scanned-epoch equivalence (parallel/gradient.py jit_sharded_epoch).

The round-4 trainers run each epoch as ONE lax.scan program; the in-body
PRNG split must reproduce the exact key sequence of a per-step Python
loop, so results are bit-compatible with the round-3 per-batch path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lkpy_tpu.parallel.gradient import jit_sharded_epoch


def _make_step(opt):
    def loss_fn(params, key, x, y):
        noise = jax.random.normal(key, y.shape) * 0.01
        pred = x @ params["w"] + params["b"]
        return jnp.mean((pred - (y + noise)) ** 2)

    def step(params, opt_state, key, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, key, x, y)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def test_scanned_epoch_matches_step_loop():
    rng = np.random.default_rng(0)
    n_steps, bs, d = 7, 16, 4
    xs = jnp.asarray(rng.normal(size=(n_steps, bs, d)).astype(np.float32))
    ys = jnp.asarray(rng.normal(size=(n_steps, bs)).astype(np.float32))
    opt = optax.adam(0.05)
    params0 = {"w": jnp.zeros((d,), jnp.float32), "b": jnp.float32(0.0)}
    step = _make_step(opt)

    # manual loop (the round-3 structure: split the key before every batch)
    key = jax.random.key(42)
    params, opt_state = params0, opt.init(params0)
    total = 0.0
    for i in range(n_steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = jax.jit(step)(params, opt_state, k, xs[i], ys[i])
        total += float(loss)

    epoch = jit_sharded_epoch(step, None, params0, opt.init(params0), set())
    p2, os2, key2, tot2 = epoch(params0, opt.init(params0), jax.random.key(42), xs, ys)

    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(params["w"]), rtol=1e-6)
    assert float(tot2) == pytest_approx(total)
    # the returned key continues the sequence exactly
    k_next_manual = jax.random.split(key)[0]
    k_next_scan = jax.random.split(key2)[0]
    np.testing.assert_array_equal(
        jax.random.key_data(k_next_manual), jax.random.key_data(k_next_scan)
    )


def pytest_approx(v):
    import pytest

    return pytest.approx(v, rel=1e-5)


def test_scanned_epoch_on_mesh_matches_single():
    """Same seed, mesh vs single device: identical results (GSPMD only
    re-partitions the math)."""
    from lkpy_tpu.parallel import MeshSpec, make_mesh
    from lkpy_tpu.parallel.gradient import epoch_batch_sharding, place_tree

    assert len(jax.devices()) == 8
    mesh = make_mesh(MeshSpec(data=4, model=2))
    rng = np.random.default_rng(3)
    n_steps, bs, d = 3, 8, 4
    xs = jnp.asarray(rng.normal(size=(n_steps, bs, d)).astype(np.float32))
    ys = jnp.asarray(rng.normal(size=(n_steps, bs)).astype(np.float32))
    opt = optax.adam(0.05)

    def fresh():
        p = {"w": jnp.zeros((d,), jnp.float32), "b": jnp.float32(0.0)}
        return p, opt.init(p)

    step = _make_step(opt)

    p0, o0 = fresh()
    e1 = jit_sharded_epoch(step, None, p0, o0, set())
    p1, _, _, t1 = e1(p0, o0, jax.random.key(7), xs, ys)

    pf, of = fresh()
    pm = place_tree(mesh, pf, set())
    om = place_tree(mesh, of, set())
    e2 = jit_sharded_epoch(step, mesh, pm, om, set())
    sh = epoch_batch_sharding(mesh)
    p2, _, _, t2 = e2(pm, om, jax.random.key(7), jax.device_put(xs, sh), jax.device_put(ys, sh))

    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(p1["w"]), atol=1e-6)
    np.testing.assert_allclose(float(t2), float(t1), rtol=1e-5)
