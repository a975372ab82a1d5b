"""Quick ALS-only bench (same dataset/shapes as bench.py section 1)."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import bench
import jax, jax.numpy as jnp
import os
jax.config.update("jax_compilation_cache_dir", os.environ.get("CACHE_DIR", "/root/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.als import als_epoch, chunk_buckets
from lkpy_tpu.ops.sparse import bucket_rows

rng = np.random.default_rng(42)
all_u, all_i = bench.synth_interactions(rng)
train_mask, test_u, test_i = bench.split_holdout(all_u, all_i, rng)
tr_u, tr_i = all_u[train_mask], all_i[train_mask]
nnz = len(tr_u)
vals = np.full(nnz, 40.0, dtype=np.float32)
ui = CSR.from_coo(tr_u, tr_i, vals, (bench.N_USERS, bench.N_ITEMS))
iu = ui.transpose()
u_buckets = chunk_buckets(bucket_rows(ui, field="rating", max_width=4096))
i_buckets = chunk_buckets(bucket_rows(iu, field="rating", max_width=65536))
print("chunks:", [tuple(b.cols.shape) for b in u_buckets], [tuple(b.cols.shape) for b in i_buckets], flush=True)
u = jnp.asarray((rng.standard_normal((bench.N_USERS, bench.K)) * 0.01).astype(np.float32) ** 2)
i = jnp.asarray((rng.standard_normal((bench.N_ITEMS, bench.K)) * 0.01).astype(np.float32) ** 2)

def epoch(u, i):
    u, i, _du, _di = als_epoch(u_buckets, i_buckets, u, i, 0.1, 0.1, mode="implicit")
    return u, i

from lkpy_tpu.ops.als import warm_epoch_programs
tww = time.time()
warm_epoch_programs(u_buckets, i_buckets, bench.N_USERS, bench.N_ITEMS, bench.K, "implicit")
print(f"parallel warm-start: {time.time()-tww:.1f}s", flush=True)

tw = time.time()
u, i = epoch(u, i)
_ = float(jnp.sum(i))
print(f"warm-up (incl compile): {time.time()-tw:.1f}s", flush=True)
ts = time.time()
for _ in range(3):
    u, i = epoch(u, i)
_ = float(jnp.sum(i))
dt = time.time() - ts
print(f"3 epochs in {dt:.2f}s -> {nnz*2*3/dt:.3e} examples/s/chip", flush=True)
