"""Temp: isolate solve vs gram cost in an implicit-ALS epoch on the TPU."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

import lkpy_tpu.ops.als as als_mod
from lkpy_tpu.ops.als import chunk_buckets as bucket_args
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
    users = (uniq // N_ITEMS).astype(np.int64)
    items = (uniq % N_ITEMS).astype(np.int64)
    vals = np.full(len(uniq), 40.0, dtype=np.float32)
    return CSR.from_coo(users, items, vals, (N_USERS, N_ITEMS)), len(uniq)


def main():
    rng = np.random.default_rng(42)
    ui, nnz = synth(rng)
    iu = ui.transpose()
    u_b = bucket_args(bucket_rows(ui, field="rating", max_width=4096))
    i_b = bucket_args(bucket_rows(iu, field="rating", max_width=65536))
    u_np = (rng.standard_normal((N_USERS, K)) * 0.01).astype(np.float32)
    i_np = (rng.standard_normal((N_ITEMS, K)) * 0.01).astype(np.float32)
    print("data ready", flush=True)

    def run_epochs(tag, n=3):
        # als_epoch donates its factor args; hand it fresh device arrays
        u, i = jnp.asarray(u_np), jnp.asarray(i_np)
        u, i, du, di = als_mod.als_epoch(u_b, i_b, u, i, 0.1, 0.1, mode="implicit")
        float(du)  # sync
        t = time.time()
        for _ in range(n):
            u, i, du, di = als_mod.als_epoch(u_b, i_b, u, i, 0.1, 0.1, mode="implicit")
        float(du)
        dt = (time.time() - t) / n
        print(f"{tag}: {dt * 1000:.1f} ms/epoch", flush=True)
        return dt

    full = run_epochs("full epoch")

    # stub out the solver: epoch becomes gathers + grams + scatters only
    real_solve = als_mod.batched_spd_solve
    als_mod.batched_spd_solve = lambda A, y: y + A[:, :, 0]
    als_mod._epoch_fn.cache_clear()
    try:
        nosolve = run_epochs("epoch w/o solves")
    finally:
        als_mod.batched_spd_solve = real_solve
        als_mod._epoch_fn.cache_clear()
    print(f"solve share: {(full - nosolve) * 1000:.1f} ms/epoch", flush=True)


main()
