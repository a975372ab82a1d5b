"""Round-4 probe: where does the ALS epoch time go, and does pair-packing
the Gram einsum onto full 128-wide MXU tiles help?

Representative shapes from the ML-20M bench: user bucket (27496, 128) k=64
(the dominant one), item buckets wider.  Timing via readback (tunnel!).
"""

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
NR = 30000  # right-table rows

rng = np.random.default_rng(0)
right = jnp.asarray(rng.normal(size=(NR, k)).astype(np.float32))
cols = jnp.asarray(rng.integers(0, NR, size=(B, P)).astype(np.int32))
conf = jnp.asarray(rng.uniform(1, 5, size=(B, P)).astype(np.float32))
G_resident = jnp.asarray(rng.normal(size=(B, P, k)).astype(np.float32))


def timeit(name, fn, *args, reps=8, flops=None):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # compile+load
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / reps
    tf = (flops / dt / 1e12) if flops else 0.0
    print(f"{name:42s} {dt*1e3:8.2f} ms   {tf:7.2f} TF/s   (chk {s:.3e})")
    return dt


gram_flops = 4.0 * B * P * k * k  # 2 MACs/entry-lane-pair convention used in ops/als.py

# 1. plain batched Gram einsum, resident data, f32 and bf16
@jax.jit
def gram_f32(G, c):
    return jnp.einsum("bpi,bp,bpj->bij", G, c, G, preferred_element_type=jnp.float32)


@jax.jit
def gram_bf16(G, c):
    Gb = G.astype(jnp.bfloat16)
    return jnp.einsum("bpi,bp,bpj->bij", Gb, c.astype(jnp.bfloat16), Gb, preferred_element_type=jnp.float32)


# 2. pair-packed: fold pairs of rows into the k dim -> (B/2, P, 2k); one
#    (2k, P)@(P, 2k) matmul per pair; diagonal 64x64 blocks are the answers
@jax.jit
def gram_packed_bf16(G, c):
    B_, P_, k_ = G.shape
    Gp = G.reshape(B_ // 2, 2, P_, k_).transpose(0, 2, 1, 3).reshape(B_ // 2, P_, 2 * k_)
    cp = c.reshape(B_ // 2, 2, P_).transpose(0, 2, 1)  # (B/2, P, 2)
    Gc = (Gp.reshape(B_ // 2, P_, 2, k_) * cp[:, :, :, None]).reshape(B_ // 2, P_, 2 * k_)
    A2 = jnp.einsum(
        "bpi,bpj->bij",
        Gc.astype(jnp.bfloat16),
        Gp.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (B/2, 2k, 2k)
    A = jnp.stack([A2[:, :k_, :k_], A2[:, k_:, k_:]], axis=1).reshape(B_, k_, k_)
    return A


@jax.jit
def gram_packed_f32(G, c):
    B_, P_, k_ = G.shape
    Gp = G.reshape(B_ // 2, 2, P_, k_).transpose(0, 2, 1, 3).reshape(B_ // 2, P_, 2 * k_)
    cp = c.reshape(B_ // 2, 2, P_).transpose(0, 2, 1)
    Gc = (Gp.reshape(B_ // 2, P_, 2, k_) * cp[:, :, :, None]).reshape(B_ // 2, P_, 2 * k_)
    A2 = jnp.einsum("bpi,bpj->bij", Gc, Gp, preferred_element_type=jnp.float32)
    A = jnp.stack([A2[:, :k_, :k_], A2[:, k_:, k_:]], axis=1).reshape(B_, k_, k_)
    return A


# 3. gather alone, and gather+gram fused (the real epoch shape)
@jax.jit
def gather_only(r, c):
    return r[c]


@jax.jit
def gather_gram_bf16(r, c, cf):
    G = r[c]
    Gb = G.astype(jnp.bfloat16)
    return jnp.einsum("bpi,bp,bpj->bij", Gb, cf.astype(jnp.bfloat16), Gb, preferred_element_type=jnp.float32)


@jax.jit
def gather_gram_packed_bf16(r, c, cf):
    G = r[c]
    return gram_packed_bf16(G, cf)


# 4. lanes-layout output: does 'ijb' cost much more than 'bij'?
@jax.jit
def gram_packed_bf16_lanes(G, c):
    B_, P_, k_ = G.shape
    Gp = G.reshape(B_ // 2, 2, P_, k_).transpose(0, 2, 1, 3).reshape(B_ // 2, P_, 2 * k_)
    cp = c.reshape(B_ // 2, 2, P_).transpose(0, 2, 1)
    Gc = (Gp.reshape(B_ // 2, P_, 2, k_) * cp[:, :, :, None]).reshape(B_ // 2, P_, 2 * k_)
    A2 = jnp.einsum(
        "bpi,bpj->ijb",
        Gc.astype(jnp.bfloat16),
        Gp.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (2k, 2k, B/2)
    A = jnp.concatenate([A2[:k_, :k_, :], A2[k_:, k_:, :]], axis=2)  # (k, k, B) [evens|odds]
    return A


timeit("gram f32 resident (bij)", gram_f32, G_resident, conf, flops=gram_flops)
timeit("gram bf16 resident (bij)", gram_bf16, G_resident, conf, flops=gram_flops)
timeit("gram PACKED f32 resident", gram_packed_f32, G_resident, conf, flops=gram_flops)
timeit("gram PACKED bf16 resident", gram_packed_bf16, G_resident, conf, flops=gram_flops)
timeit("gram PACKED bf16 resident -> lanes", gram_packed_bf16_lanes, G_resident, conf, flops=gram_flops)
timeit("gather only", gather_only, right, cols)
timeit("gather + gram bf16", gather_gram_bf16, right, cols, conf, flops=gram_flops)
timeit("gather + gram PACKED bf16", gather_gram_packed_bf16, right, cols, conf, flops=gram_flops)

# sanity: packed == plain
a0 = np.asarray(gram_f32(G_resident[:256], conf[:256]))
a1 = np.asarray(gram_packed_f32(G_resident[:256], conf[:256]))
print("packed matches plain:", np.allclose(a0, a1, atol=1e-3), np.abs(a0 - a1).max())
