"""Round-4 probe: gather variants — the (B,P,k) factor gather is ~10 ms for
2M rows (50 GB/s effective), on par with the whole Gram einsum.  Which
formulation is fastest, and does bf16 halve it?"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from lkpy_tpu.config import ensure_compile_cache

ensure_compile_cache()
print("devices:", jax.devices())

k = 64
B = 16384
P = 128
NR = 30000

rng = np.random.default_rng(0)
right = jnp.asarray(rng.normal(size=(NR, k)).astype(np.float32))
right_bf = right.astype(jnp.bfloat16)
cols = jnp.asarray(rng.integers(0, NR, size=(B, P)).astype(np.int32))
cols_sorted = jnp.asarray(np.sort(rng.integers(0, NR, size=(B, P)).astype(np.int32), axis=1))
conf = jnp.asarray(rng.uniform(1, 5, size=(B, P)).astype(np.float32))


def timeit(name, fn, *args, reps=8, flops=None):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / reps
    tf = (flops / dt / 1e12) if flops else 0.0
    print(f"{name:46s} {dt*1e3:8.2f} ms   {tf:7.2f} TF/s   (chk {s:.3e})")
    return dt


timeit("gather f32 (B,P) fancy", lambda r, c: r[c], right, cols)
timeit("gather bf16 (B,P) fancy", lambda r, c: r[c], right_bf, cols)
timeit("gather f32 sorted-in-row", lambda r, c: r[c], right, cols_sorted)
timeit("gather f32 flat take", lambda r, c: jnp.take(r, c.reshape(-1), axis=0), right, cols)
timeit(
    "gather f32 onehot-free dynslice-scan",
    jax.jit(lambda r, c: r[c.reshape(-1)].reshape(B, P, k)),
    right,
    cols,
)

gram_flops = 4.0 * B * P * k * k


@jax.jit
def gather_gram_bf16tab(r, c, cf):
    G = r[c]  # bf16 gather
    return jnp.einsum(
        "bpi,bp,bpj->bij", G, cf.astype(jnp.bfloat16), G, preferred_element_type=jnp.float32
    )


@jax.jit
def gather_gram_f32(r, c, cf):
    G = r[c]
    Gb = G.astype(jnp.bfloat16)
    return jnp.einsum(
        "bpi,bp,bpj->bij", Gb, cf.astype(jnp.bfloat16), Gb, preferred_element_type=jnp.float32
    )


timeit("gather(bf16 tab) + gram bf16", gather_gram_bf16tab, right_bf, cols, conf, flops=gram_flops)
timeit("gather(f32 tab) + gram bf16", gather_gram_f32, right, cols, conf, flops=gram_flops)


# y einsum too (rhs): included in epoch
@jax.jit
def gather_gram_y(r, c, cf):
    G = r[c]
    A = jnp.einsum("bpi,bp,bpj->bij", G, cf.astype(jnp.bfloat16), G, preferred_element_type=jnp.float32)
    y = jnp.einsum("bpi,bp->bi", G.astype(jnp.float32), cf + 1.0, preferred_element_type=jnp.float32)
    return A, y


timeit("gather(bf16) + gram + y", gather_gram_y, right_bf, cols, conf, flops=gram_flops)

# lanes-layout A output for the GJ-lanes solver
@jax.jit
def gather_gram_y_lanes(r, c, cf):
    G = r[c]
    A = jnp.einsum("bpi,bp,bpj->ijb", G, cf.astype(jnp.bfloat16), G, preferred_element_type=jnp.float32)
    y = jnp.einsum("bpi,bp->ib", G.astype(jnp.float32), cf + 1.0, preferred_element_type=jnp.float32)
    return A, y


timeit("gather(bf16) + gram + y -> lanes (ijb)", gather_gram_y_lanes, right_bf, cols, conf, flops=gram_flops)

# how does P scale? the item half has wide buckets
for Pw in (512, 4096):
    Bw = (B * P) // Pw
    cw = jnp.asarray(rng.integers(0, NR, size=(Bw, Pw)).astype(np.int32))
    cfw = jnp.asarray(rng.uniform(1, 5, size=(Bw, Pw)).astype(np.float32))
    timeit(f"gather(bf16)+gram+y P={Pw}", gather_gram_y, right_bf, cw, cfw, flops=gram_flops)
