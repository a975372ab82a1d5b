"""Profile ALS half-epoch loop structures on the real TPU.

Variants (user half of the bench's synthetic ML-20M, implicit mode):
  scan4   — current: lax.scan over fixed-shape chunks, left in carry (4M entries)
  scan16  — same, 16M-entry chunks (fewer, bigger iterations)
  nocarry — scan stacks solutions, ONE scatter outside the scan (no false dep)
  nocarry16 — nocarry at 16M entries
  unroll  — r1-style static unrolled chunks (compile-cost reference)

Usage: python _profile_scan.py scan4 nocarry ...
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

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.als import chunk_buckets, implicit_otor, solve_implicit_bucket
from lkpy_tpu.ops.sparse import bucket_rows

N_USERS, N_ITEMS, NNZ, K = 138_000, 27_000, 20_000_000, 64


def build():
    rng = np.random.default_rng(42)
    users = rng.integers(0, N_USERS, NNZ)
    item_w = 1.0 / np.arange(1, N_ITEMS + 1) ** 0.8
    cdf = np.cumsum(item_w / item_w.sum())
    items = np.searchsorted(cdf, rng.random(NNZ))
    key = np.unique(users * N_ITEMS + items)
    u, i = (key // N_ITEMS).astype(np.int64), (key % N_ITEMS).astype(np.int64)
    vals = np.full(len(u), 40.0, dtype=np.float32)
    ui = CSR.from_coo(u, i, vals, (N_USERS, N_ITEMS))
    return ui, len(u)


def scan_half(chunks, left, right, reg, carry_left=True):
    otor = implicit_otor(right, reg)
    n_rows = left.shape[0]

    if carry_left:
        def body(carry, xs):
            left, dsq = carry
            rows, cols, vals, mask = xs
            x = solve_implicit_bucket(cols, vals, mask, right, otor)
            valid = (rows < n_rows)[:, None]
            x = jnp.where(valid, x, 0.0)
            dsq = dsq + jnp.sum(jnp.square(x - left[rows]) * valid)
            left = left.at[rows].set(x, mode="drop")
            return (left, dsq), None

        dsq = jnp.float32(0.0)
        for ch in chunks:
            (left, dsq), _ = jax.lax.scan(body, (left, dsq), tuple(ch))
        return left, dsq
    else:
        def body(_, xs):
            rows, cols, vals, mask = xs
            x = solve_implicit_bucket(cols, vals, mask, right, otor)
            x = jnp.where((rows < n_rows)[:, None], x, 0.0)
            return None, x

        dsq = jnp.float32(0.0)
        for ch in chunks:
            _, xs = jax.lax.scan(body, None, tuple(ch))  # (C, B, K)
            rows = ch.rows.reshape(-1)
            x = xs.reshape(-1, xs.shape[-1])
            valid = (rows < n_rows)[:, None]
            dsq = dsq + jnp.sum(jnp.square(x - left[rows]) * valid)
            left = left.at[rows].set(x, mode="drop")
        return left, dsq


def unroll_half(chunks, left, right, reg):
    otor = implicit_otor(right, reg)
    n_rows = left.shape[0]
    dsq = jnp.float32(0.0)
    for ch in chunks:
        C = ch.rows.shape[0]
        for c in range(C):
            rows, cols, vals, mask = ch.rows[c], ch.cols[c], ch.values[c], ch.mask[c]
            x = solve_implicit_bucket(cols, vals, mask, right, otor)
            valid = (rows < n_rows)[:, None]
            x = jnp.where(valid, x, 0.0)
            dsq = dsq + jnp.sum(jnp.square(x - left[rows]) * valid)
            left = left.at[rows].set(x, mode="drop")
    return left, dsq


def main():
    variants = sys.argv[1:] or ["scan4", "nocarry", "nocarry16"]
    t0 = time.time()
    ui, nnz = build()
    print(f"built {nnz} nnz in {time.time()-t0:.1f}s", flush=True)
    rng = np.random.default_rng(0)
    u0 = (rng.standard_normal((N_USERS, K)).astype(np.float32) * 0.01) ** 2
    right = jnp.asarray((rng.standard_normal((N_ITEMS, K)).astype(np.float32) * 0.01) ** 2)
    buckets = bucket_rows(ui, field="rating", max_width=4096)

    for name in variants:
        entries = 16_000_000 if "16" in name else 4_000_000
        chunks = chunk_buckets(buckets, entries=entries)
        print(f"{name}: chunks={[tuple(c.cols.shape) for c in chunks]}", flush=True)
        if name.startswith("scan"):
            fn = partial(scan_half, carry_left=True)
        elif name.startswith("nocarry"):
            fn = partial(scan_half, carry_left=False)
        else:
            fn = unroll_half

        @partial(jax.jit, donate_argnums=(0,))
        def half(left, right, chunks, fn=fn):
            return fn(chunks, left, right, jnp.float32(0.1))

        left = jnp.asarray(u0)
        tc = time.time()
        left, dsq = half(left, right, chunks)
        _ = float(dsq)
        compile_s = time.time() - tc
        reps = 5
        tr = time.time()
        for _ in range(reps):
            left, dsq = half(left, right, chunks)
        _ = float(dsq)
        dt = (time.time() - tr) / reps
        print(f"{name}: compile+first={compile_s:.1f}s  half-epoch={dt*1000:.0f}ms  "
              f"({nnz/dt/1e6:.1f}M examples/s)", flush=True)


if __name__ == "__main__":
    main()
