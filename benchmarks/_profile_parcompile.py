"""Can the remote compile service parallelize? AOT-compile all per-bucket
ALS programs from a thread pool and time the total."""
import os, sys, time
from concurrent.futures import ThreadPoolExecutor
import numpy as np
sys.path.insert(0, "/root/repo")
import bench
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ.get("CACHE_DIR", "/tmp/jc_par"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops import als as A
from lkpy_tpu.ops.sparse import bucket_rows

rng = np.random.default_rng(42)
all_u, all_i = bench.synth_interactions(rng)
train_mask, _tu, _ti = bench.split_holdout(all_u, all_i, rng)
tr_u, tr_i = all_u[train_mask], all_i[train_mask]
ui = CSR.from_coo(tr_u, tr_i, np.full(len(tr_u), 40.0, np.float32), (bench.N_USERS, bench.N_ITEMS))
iu = ui.transpose()
u_chunks = A.chunk_buckets(bucket_rows(ui, field="rating", max_width=4096))
i_chunks = A.chunk_buckets(bucket_rows(iu, field="rating", max_width=65536))
K = bench.K
print("built", flush=True)

jobs = []
for side, chunks, n_right in (("u", u_chunks, bench.N_ITEMS), ("i", i_chunks, bench.N_USERS)):
    right = jax.ShapeDtypeStruct((n_right, K), jnp.float32)
    otor = jax.ShapeDtypeStruct((K, K), jnp.float32)
    for ch in chunks:
        C, B, P = ch.cols.shape
        cols = jax.ShapeDtypeStruct((C, B, P), jnp.int32)
        vals = jax.ShapeDtypeStruct((C, B, P), jnp.float32)
        mask = jax.ShapeDtypeStruct((C, B, P), jnp.bool_)
        jobs.append((f"{side}:solve{(C,B,P)}", A._solve_scan_implicit, (cols, vals, mask, right, otor)))
        n_left = bench.N_USERS if side == "u" else bench.N_ITEMS
        left = jax.ShapeDtypeStruct((n_left, K), jnp.float32)
        rows = jax.ShapeDtypeStruct((C, B), jnp.int32)
        xs = jax.ShapeDtypeStruct((C, B, K), jnp.float32)
        dsq = jax.ShapeDtypeStruct((), jnp.float32)
        jobs.append((f"{side}:apply{(C,B)}", A._apply_update_fn(None), (left, rows, xs, dsq)))


def compile_one(job):
    name, fn, argspecs = job
    t0 = time.time()
    fn.lower(*argspecs).compile()
    return name, time.time() - t0


t0 = time.time()
with ThreadPoolExecutor(max_workers=8) as pool:
    for name, dt in pool.map(compile_one, jobs):
        print(f"{name}: {dt:.1f}s", flush=True)
print(f"TOTAL parallel compile: {time.time()-t0:.1f}s for {len(jobs)} programs", flush=True)
