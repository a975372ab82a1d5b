"""Temp: time user half vs item half of the implicit ALS epoch."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

from lkpy_tpu.ops.als import als_half_epoch, chunk_buckets as bucket_args
from lkpy_tpu.ops.sparse import bucket_rows

N_USERS, N_ITEMS, NNZ, K = 138_000, 27_000, 20_000_000, 64


def synth(rng):
    from lkpy_tpu.data.matrix import CSR

    item_w = 1.0 / np.arange(1, N_ITEMS + 1) ** 0.8
    cdf = np.cumsum(item_w / item_w.sum())
    items = np.searchsorted(cdf, rng.random(NNZ)).astype(np.int64)
    users = rng.integers(0, N_USERS, size=NNZ).astype(np.int64)
    key = users * N_ITEMS + items
    uniq = np.unique(key)
    return CSR.from_coo(
        (uniq // N_ITEMS).astype(np.int64),
        (uniq % N_ITEMS).astype(np.int64),
        np.full(len(uniq), 40.0, dtype=np.float32),
        (N_USERS, N_ITEMS),
    ), len(uniq)


rng = np.random.default_rng(42)
ui, nnz = synth(rng)
iu = ui.transpose()
for max_w in (65536, 16384):
    i_buckets = bucket_rows(iu, field="rating", max_width=max_w)
    print(f"item buckets (max_width={max_w}):", [(b.cols.shape) for b in i_buckets], flush=True)

u_b = bucket_rows(ui, field="rating", max_width=4096)
u_np = (rng.standard_normal((N_USERS, K)) * 0.01).astype(np.float32)
i_np = (rng.standard_normal((N_ITEMS, K)) * 0.01).astype(np.float32)


def run_half(tag, buckets, left_np, right_np, n=3):
    left, _ = als_half_epoch(buckets, jnp.asarray(left_np), jnp.asarray(right_np), 0.1, mode="implicit")
    left.block_until_ready()
    float(jnp.sum(left))
    t = time.time()
    left = jnp.asarray(left_np)
    for _ in range(n):
        left, _ = als_half_epoch(buckets, left, jnp.asarray(right_np), 0.1, mode="implicit")
    float(jnp.sum(left))
    print(f"{tag}: {(time.time() - t) / n * 1000:.1f} ms", flush=True)


run_half("user half", u_b, u_np, i_np)
for max_w in (65536, 16384, 8192):
    i_b = bucket_rows(iu, field="rating", max_width=max_w)
    run_half(f"item half (max_width={max_w})", i_b, i_np, u_np)
