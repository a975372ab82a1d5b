"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lkpy_tpu.parallel import MeshSpec, make_mesh, shard_rows, sharded_topk
from lkpy_tpu.parallel.ops import sharded_matmul_topk


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests need the 8-device virtual CPU mesh"
    return make_mesh(MeshSpec(data=4, model=2))


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 4, "model": 2}


def test_sharded_topk(mesh):
    rng = np.random.default_rng(42)
    scores = rng.normal(size=(6, 64)).astype(np.float32)
    from lkpy_tpu.parallel.ops import shard_batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = jax.device_put(jnp.asarray(scores), NamedSharding(mesh, P(None, "model")))
    vals, idx = sharded_topk(s, 5, mesh)
    evals = np.sort(scores, axis=1)[:, ::-1][:, :5]
    np.testing.assert_allclose(np.asarray(vals), evals, atol=1e-6)
    # indices point at the right values
    np.testing.assert_allclose(np.take_along_axis(scores, np.asarray(idx), axis=1), evals, atol=1e-6)


def test_sharded_matmul_topk(mesh):
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    table = rng.normal(size=(64, 16)).astype(np.float32)
    t = shard_rows(jnp.asarray(table), mesh)
    vals, idx = sharded_matmul_topk(q, t, 8, mesh)
    full = np.asarray(q) @ table.T
    expected = np.sort(full, axis=1)[:, ::-1][:, :8]
    np.testing.assert_allclose(np.asarray(vals), expected, atol=1e-5)




def test_sharded_als_matches_single(mesh):
    import scipy.sparse as sps

    from lkpy_tpu.data.matrix import CSR
    from lkpy_tpu.ops.als import als_half_epoch
    from lkpy_tpu.ops.sparse import bucket_rows
    from lkpy_tpu.parallel.als import sharded_half_epoch

    rng = np.random.default_rng(42)
    mat = sps.random(64, 32, density=0.2, random_state=42, format="csr")
    mat.data = rng.normal(size=mat.nnz).astype(np.float32)
    csr = CSR.from_scipy(mat)
    right = rng.normal(size=(32, 8)).astype(np.float32)
    buckets = bucket_rows(csr)

    single, _ = als_half_epoch(buckets, jnp.zeros((64, 8)), jnp.asarray(right), 0.1, mode="explicit")
    sharded = sharded_half_epoch(
        buckets, jnp.zeros((65, 8)), jnp.asarray(right), 0.1, mode="explicit", mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(sharded)[:64], np.asarray(single), atol=1e-5)


def test_graft_entry():
    """Run the flagship entry + full multichip dryrun in a SUBPROCESS: the
    dryrun trains every sharded family end-to-end, and running it inside
    the suite process (hundreds of live compiled programs + test state)
    aborted the CPU backend with an OOM-class fatal error — isolation makes
    the test about the code, not the suite's memory high-water mark."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("PYTHONPATH", None)
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import jax\n"
        "import importlib.util\n"
        "spec = importlib.util.spec_from_file_location('__graft_entry__', '/root/repo/__graft_entry__.py')\n"
        "mod = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(mod)\n"
        "fn, args = mod.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "assert out.shape == (16, 8)\n"
        "mod.dryrun_multichip(8)\n"
        "print('GRAFT_OK')\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=900, env=env
    )
    if res.returncode < 0:
        # killed by a signal: the CPU backend's thread pool occasionally
        # SIGABRTs under heavy host contention (observed once mid-suite,
        # passes in isolation) — retry once; a Python-level failure
        # (returncode > 0, real assertion/traceback) is NOT retried
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=900, env=env
        )
    assert res.returncode == 0, f"graft entry failed:\n{res.stdout[-2000:]}\n{res.stderr[-2000:]}"
    assert "GRAFT_OK" in res.stdout


def test_distributed_noop_single_host(monkeypatch):
    """With no coordinator configured, init is a no-op and host helpers work."""
    from lkpy_tpu.parallel import distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.setattr(distributed, "_initialized", False)
    assert distributed.init_distributed() is False
    assert distributed.is_coordinator()
    assert distributed.host_count() == 1
    assert distributed.host_index() == 0
    assert distributed.local_device_count() == len(jax.devices())
