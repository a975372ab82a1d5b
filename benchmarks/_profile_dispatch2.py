"""Instrument per-program first-call times for the per-bucket dispatch epoch."""
import sys, time
from functools import partial
import numpy as np
sys.path.insert(0, "/root/repo")
import bench
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.als import chunk_buckets, implicit_otor, solve_implicit_bucket
from lkpy_tpu.ops.sparse import bucket_rows

rng = np.random.default_rng(42)
all_u, all_i = bench.synth_interactions(rng)
train_mask, _tu, _ti = bench.split_holdout(all_u, all_i, rng)
tr_u, tr_i = all_u[train_mask], all_i[train_mask]
nnz = len(tr_u)
ui = CSR.from_coo(tr_u, tr_i, np.full(nnz, 40.0, np.float32), (bench.N_USERS, bench.N_ITEMS))
iu = ui.transpose()
u_chunks = chunk_buckets(bucket_rows(ui, field="rating", max_width=4096))
i_chunks = chunk_buckets(bucket_rows(iu, field="rating", max_width=65536))
print("built", flush=True)

u = jnp.asarray((rng.standard_normal((bench.N_USERS, bench.K)) * 0.01).astype(np.float32) ** 2)
i = jnp.asarray((rng.standard_normal((bench.N_ITEMS, bench.K)) * 0.01).astype(np.float32) ** 2)


@jax.jit
def solve_scan(cols, conf, mask, right, otor):
    def b(_, xs):
        c, v, m = xs
        return None, solve_implicit_bucket(c, v, m, right, otor)
    _, out = jax.lax.scan(b, None, (cols, conf, mask))
    return out


@partial(jax.jit, donate_argnums=(0,))
def apply_update(left, rows, xs, dsq):
    n_rows = left.shape[0]
    rows = rows.reshape(-1)
    x = xs.reshape(-1, xs.shape[-1])
    valid = (rows < n_rows)[:, None]
    dsq = dsq + jnp.sum(jnp.square(x - left[rows]) * valid)
    return left.at[rows].set(jnp.where(valid, x, 0.0), mode="drop"), dsq


def timed_half(name, left, right, chunks, reg):
    t0 = time.time()
    otor = implicit_otor(right, jnp.float32(reg))
    jax.block_until_ready(otor)
    print(f"{name} otor: {time.time()-t0:.1f}s", flush=True)
    dsq = jnp.float32(0.0)
    for ch in chunks:
        t0 = time.time()
        xs = solve_scan(ch.cols, ch.values, ch.mask, right, otor)
        jax.block_until_ready(xs)
        t1 = time.time()
        left, dsq = apply_update(left, ch.rows, xs, dsq)
        jax.block_until_ready(left)
        print(f"{name} {tuple(ch.cols.shape)}: solve {t1-t0:.1f}s scatter {time.time()-t1:.1f}s", flush=True)
    return left, dsq


tw = time.time()
u, _ = timed_half("user", u, i, u_chunks, 0.1)
i, _ = timed_half("item", i, u, i_chunks, 0.1)
_ = float(jnp.sum(i))
print(f"warm-up total: {time.time()-tw:.1f}s", flush=True)
