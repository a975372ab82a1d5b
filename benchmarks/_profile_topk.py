"""Profile large-catalog top-k retrieval strategies on the real TPU.

Variants at N=500k items, D=64, B=4096 queries, k=100:
  xla      — current fallback: full (B, N) matmul + lax.top_k (sort-based)
  approx   — B-chunked matmul + jax.lax.approx_max_k (hardware TopK)
  approx_bf16 — same with bf16 matmul inputs
  tiled    — scan over item tiles, per-tile top_k(k), final merge

Also measures approx recall vs exact.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

N, D, B, K = 500_000, 64, 4096, 100


@partial(jax.jit, static_argnames=("k",))
def xla_topk(q, tbl, k):
    s = jnp.dot(q, tbl.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(s, k)


@partial(jax.jit, static_argnames=("k", "bc", "recall"))
def approx_topk(q, tbl, k, bc=512, recall=0.99):
    Bq = q.shape[0]

    def body(_, qc):
        s = jnp.dot(qc, tbl.T, preferred_element_type=jnp.float32)
        v, i = jax.lax.approx_max_k(s, k, recall_target=recall, aggregate_to_topk=True)
        return None, (v, i)

    _, (v, i) = jax.lax.scan(body, None, q.reshape(Bq // bc, bc, -1))
    return v.reshape(Bq, k), i.reshape(Bq, k)


@partial(jax.jit, static_argnames=("k", "bc", "recall"))
def approx_topk_bf16(q, tbl, k, bc=512, recall=0.99):
    Bq = q.shape[0]
    tb = tbl.astype(jnp.bfloat16)

    def body(_, qc):
        s = jnp.dot(qc.astype(jnp.bfloat16), tb.T, preferred_element_type=jnp.float32)
        v, i = jax.lax.approx_max_k(s, k, recall_target=recall, aggregate_to_topk=True)
        return None, (v, i)

    _, (v, i) = jax.lax.scan(body, None, q.reshape(Bq // bc, bc, -1))
    return v.reshape(Bq, k), i.reshape(Bq, k)


@partial(jax.jit, static_argnames=("k", "nt"))
def tiled_topk(q, tbl, k, nt=25_000):
    T = tbl.shape[0] // nt

    def body(_, xs):
        tile, base = xs
        s = jnp.dot(q, tile.T, preferred_element_type=jnp.float32)
        v, i = jax.lax.top_k(s, k)
        return None, (v, i + base)

    tiles = tbl.reshape(T, nt, -1)
    bases = jnp.arange(T, dtype=jnp.int32) * nt
    _, (v, i) = jax.lax.scan(body, None, (tiles, bases))
    # (T, B, k) -> (B, T*k) merge
    v = jnp.moveaxis(v, 0, 1).reshape(q.shape[0], -1)
    i = jnp.moveaxis(i, 0, 1).reshape(q.shape[0], -1)
    mv, mi = jax.lax.top_k(v, k)
    return mv, jnp.take_along_axis(i, mi, axis=1)


def sync(x):
    return float(jnp.sum(x))


def main():
    rng = np.random.default_rng(7)
    tbl = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    fns = {
        "xla": xla_topk,
        "approx": approx_topk,
        "approx_bf16": approx_topk_bf16,
        "tiled": tiled_topk,
    }
    want = sys.argv[1:] or list(fns)
    results = {}
    for name in want:
        fn = fns[name]
        tc = time.time()
        v, i = fn(q, tbl, K)
        sync(v)
        compile_s = time.time() - tc
        reps = 8
        tr = time.time()
        for _ in range(reps):
            v, i = fn(q, tbl, K)
        sync(v)
        dt = (time.time() - tr) / reps
        results[name] = (np.asarray(i), dt)
        print(f"{name}: compile+first={compile_s:.1f}s  {dt*1000:.1f} ms/batch  "
              f"{B/dt:.3e} qps", flush=True)

    if "xla" in results:
        exact = results["xla"][0]
        for name, (idx, _) in results.items():
            if name == "xla":
                continue
            rec = np.mean([len(set(a) & set(b)) / K for a, b in zip(exact, idx)])
            print(f"{name}: recall@{K} vs exact = {rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
