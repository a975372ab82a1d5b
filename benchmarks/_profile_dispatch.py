"""Per-bucket dispatch vs fused epoch: runtime + compile on the real TPU.

Runs the bench ALS shapes as SEPARATE jitted programs per bucket (solve-scan
+ scatter), all enqueued asynchronously, one readback at the end.
"""
import sys, time
from functools import partial
import numpy as np
sys.path.insert(0, "/root/repo")
import bench
import jax, jax.numpy as jnp
from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.als import chunk_buckets, implicit_otor, solve_implicit_bucket
from lkpy_tpu.ops.sparse import bucket_rows

rng = np.random.default_rng(42)
all_u, all_i = bench.synth_interactions(rng)
train_mask, _tu, _ti = bench.split_holdout(all_u, all_i, rng)
tr_u, tr_i = all_u[train_mask], all_i[train_mask]
nnz = len(tr_u)
vals = np.full(nnz, 40.0, dtype=np.float32)
ui = CSR.from_coo(tr_u, tr_i, vals, (bench.N_USERS, bench.N_ITEMS))
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


def half(left, right, chunks, reg):
    otor = implicit_otor(right, jnp.float32(reg))
    dsq = jnp.float32(0.0)
    for ch in chunks:
        xs = solve_scan(ch.cols, ch.values, ch.mask, right, otor)
        left, dsq = apply_update(left, ch.rows, xs, dsq)
    return left, dsq


def epoch(u, i):
    u, _ = half(u, i, u_chunks, 0.1)
    i, _ = half(i, u, i_chunks, 0.1)
    return u, i


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
