"""
Benchmark entry point (driver-run, real TPU).

Measures the BASELINE.json north-star metric: implicit-ALS training
throughput (interaction examples processed per second per chip) at ML-20M
scale (synthetic 138k users x 27k items x 20M interactions, 64 factors —
matching the real ML-20M marginals), using the batched-Cholesky ALS kernels.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` divides by an estimated CPU-LensKit throughput of 2.0e6
examples/s (the reference publishes no numbers — BASELINE.md: "published: {}";
this estimate is an 8-core rayon ALS pass over 20M ratings in ~10 s/epoch,
consistent with the reference's kernel design).  The north-star target is
>= 10x.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CPU_BASELINE_EXAMPLES_PER_S = 2.0e6

# ML-20M-like scale
N_USERS = 138_000
N_ITEMS = 27_000
NNZ = 20_000_000
K = 64
EPOCHS = 3  # timed epochs (after warm-up)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def synth_dataset(rng: np.random.Generator):
    """Synthetic interactions with MovieLens-like popularity skew."""
    from lkpy_tpu.data.matrix import CSR

    # zipf-ish item popularity via inverse-CDF (vectorized, fast)
    item_w = 1.0 / np.arange(1, N_ITEMS + 1) ** 0.8
    cdf = np.cumsum(item_w / item_w.sum())
    items = np.searchsorted(cdf, rng.random(NNZ)).astype(np.int64)
    users = rng.integers(0, N_USERS, size=NNZ).astype(np.int64)
    # dedupe (user, item)
    key = users * N_ITEMS + items
    uniq = np.unique(key)
    users = (uniq // N_ITEMS).astype(np.int64)
    items = (uniq % N_ITEMS).astype(np.int64)
    vals = np.full(len(uniq), 40.0, dtype=np.float32)  # confidence weight w=40
    return CSR.from_coo(users, items, vals, (N_USERS, N_ITEMS)), len(uniq)


def main():
    t0 = time.time()
    import jax

    # persistent compilation cache: remote-tunnel compiles are expensive
    # (seconds to minutes per program); cache them across bench runs
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from lkpy_tpu.ops.als import als_epoch, bucket_args
    from lkpy_tpu.ops.sparse import bucket_rows

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(42)
    ui, nnz = synth_dataset(rng)
    iu = ui.transpose()
    log(f"dataset built: {nnz} interactions ({time.time() - t0:.1f}s)")

    u_buckets = bucket_args(bucket_rows(ui, field="rating", max_width=4096))
    i_buckets = bucket_args(bucket_rows(iu, field="rating", max_width=65536))
    log(f"buckets: users={[b[1].shape for b in u_buckets]}, items={[b[1].shape for b in i_buckets]}")

    u = jnp.asarray((rng.standard_normal((N_USERS, K)) * 0.01).astype(np.float32) ** 2)
    i = jnp.asarray((rng.standard_normal((N_ITEMS, K)) * 0.01).astype(np.float32) ** 2)

    def epoch(u, i):
        # ONE device program per epoch (both halves); deltas stay on device
        u, i, _du, _di = als_epoch(u_buckets, i_buckets, u, i, 0.1, 0.1, mode="implicit")
        return u, i

    def sync(x):
        # block_until_ready is NOT sufficient on remote (tunneled) backends —
        # force a device->host readback so timing covers actual execution
        return float(jnp.sum(x))

    # warm-up (compilation)
    tw = time.time()
    u, i = epoch(u, i)
    sync(i)
    log(f"warm-up epoch (incl. compile): {time.time() - tw:.1f}s")

    ts = time.time()
    for _ in range(EPOCHS):
        u, i = epoch(u, i)
    sync(i)
    dt = time.time() - ts
    # one epoch touches each interaction twice (user half + item half)
    examples_per_s = nnz * 2 * EPOCHS / dt
    log(f"{EPOCHS} epochs in {dt:.2f}s -> {examples_per_s:.3e} examples/s/chip")

    print(
        json.dumps(
            {
                "metric": "als_implicit_train_examples_per_s_per_chip",
                "value": round(examples_per_s, 1),
                "unit": "examples/s",
                "vs_baseline": round(examples_per_s / CPU_BASELINE_EXAMPLES_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
