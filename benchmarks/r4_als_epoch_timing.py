"""Time the round-4 fused ALS epoch on the exact bench.py workload."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench
from lkpy_tpu.config import ensure_compile_cache

ensure_compile_cache()
import jax
import jax.numpy as jnp

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.als import als_epoch, chunk_buckets, chunk_stats, warm_epoch_programs
from lkpy_tpu.ops.sparse import bucket_rows

rng = np.random.default_rng(42)
all_u, all_i = bench.synth_interactions(rng)
train_mask, test_u, test_i = bench.split_holdout(all_u, all_i, rng)
tr_u, tr_i = all_u[train_mask], all_i[train_mask]
nnz = len(tr_u)
vals = np.full(nnz, 40.0, dtype=np.float32)
ui = CSR.from_coo(tr_u, tr_i, vals, (bench.N_USERS, bench.N_ITEMS))
iu = ui.transpose()
print(f"dataset: {nnz} nnz", flush=True)

u_buckets = chunk_buckets(bucket_rows(ui, field="rating", max_width=4096, ratio=1.35))
i_buckets = chunk_buckets(bucket_rows(iu, field="rating", max_width=65536, ratio=1.35))
print("user chunks:", [b.cols.shape for b in u_buckets], flush=True)
print("item chunks:", [b.cols.shape for b in i_buckets], flush=True)

K = bench.K
u = jnp.asarray((rng.standard_normal((bench.N_USERS, K)) * 0.01).astype(np.float32) ** 2)
i = jnp.asarray((rng.standard_normal((bench.N_ITEMS, K)) * 0.01).astype(np.float32) ** 2)

tw = time.time()
warm_epoch_programs(u_buckets, i_buckets, bench.N_USERS, bench.N_ITEMS, K, "implicit")
u, i, _du, _di = als_epoch(u_buckets, i_buckets, u, i, 0.1, 0.1, mode="implicit")
_ = float(jnp.sum(i))
print(f"warmup (prime + 1 epoch): {time.time()-tw:.1f}s", flush=True)

ts = time.time()
for _e in range(3):
    u, i, _du, _di = als_epoch(u_buckets, i_buckets, u, i, 0.1, 0.1, mode="implicit")
_ = float(jnp.sum(i))
dt = time.time() - ts
print(f"3 epochs in {dt:.2f}s -> {nnz*2*3/dt:.3e} examples/s/chip", flush=True)
