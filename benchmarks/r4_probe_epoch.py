"""Round-4 probe: candidate fused half-epoch pipeline at ML-20M-like scale.

Pipeline: bitcast-128-lane gather (292M rows/s measured) + fused Gram/y
einsums emitting lanes layout + strip-blocked GJ solve + scatter.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from lkpy_tpu.config import ensure_compile_cache

ensure_compile_cache()
from lkpy_tpu.ops.pallas_gj import spd_solve_lanes

print("devices:", jax.devices())

k = 64
NR = 27000

rng = np.random.default_rng(0)
right = jnp.asarray(rng.normal(size=(NR, k)).astype(np.float32) * 0.1)


def timeit(name, fn, *args, reps=8, entries=None):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / reps
    ns = f"{dt/entries*1e9:6.2f} ns/entry" if entries else ""
    print(f"{name:44s} {dt*1e3:8.2f} ms   {ns}  (chk {s:.3e})")
    return dt


def bitcast_gather(r, c):
    """Gather f32 rows via the (NR, 2k)-bf16 bitcast view — lossless, runs
    at the 128-lane gather sweet spot (292M rows/s vs 213M direct f32)."""
    rb = jax.lax.bitcast_convert_type(r, jnp.bfloat16).reshape(NR, 2 * k)  # (NR, k, 2) -> (NR, 2k)
    g2 = rb[c]  # (B, P, 2k) bf16
    B, P, _ = g2.shape
    return jax.lax.bitcast_convert_type(g2.reshape(B, P, k, 2), jnp.float32)


@jax.jit
def half_gram_ijb(r, cols, conf, mask):
    """Fused gather + Gram + y, lanes-layout outputs (short-row path)."""
    G = bitcast_gather(r, cols)
    cm = (conf * mask).astype(jnp.bfloat16)
    Gb = G.astype(jnp.bfloat16)
    A = jnp.einsum("bpi,bp,bpj->ijb", Gb, cm, Gb, preferred_element_type=jnp.float32)
    y = jnp.einsum("bpi,bp->ib", G, (conf + 1.0) * mask, preferred_element_type=jnp.float32)
    return A, y


@jax.jit
def half_gram_bij(r, cols, conf, mask):
    G = bitcast_gather(r, cols)
    cm = (conf * mask).astype(jnp.bfloat16)
    Gb = G.astype(jnp.bfloat16)
    A = jnp.einsum("bpi,bp,bpj->bij", Gb, cm, Gb, preferred_element_type=jnp.float32)
    y = jnp.einsum("bpi,bp->bi", G, (conf + 1.0) * mask, preferred_element_type=jnp.float32)
    return A, y


B, P = 16384, 128
cols = jnp.asarray(rng.integers(0, NR, size=(B, P)).astype(np.int32))
conf = jnp.asarray(rng.uniform(1, 5, size=(B, P)).astype(np.float32))
mask = jnp.asarray(np.ones((B, P), np.float32))

E = B * P
timeit("gather(bitcast) + gram + y -> ijb", half_gram_ijb, right, cols, conf, mask, entries=E)
timeit("gather(bitcast) + gram + y -> bij", half_gram_bij, right, cols, conf, mask, entries=E)

# full short-row pipeline: gram -> +otor -> GJ -> (k,B)
otor = jnp.dot(right.T, right, preferred_element_type=jnp.float32) + 0.1 * jnp.eye(k)


@jax.jit
def short_pipeline(r, cols, conf, mask, otor):
    A, y = half_gram_ijb(r, cols, conf, mask)
    A = A + otor[:, :, None]
    return spd_solve_lanes(A, y, bt=128)


timeit("short rows: gram+otor+GJ solve", short_pipeline, right, cols, conf, mask, otor, entries=E)

# long-row path: segment-sum A contributions by row (bij), then to lanes
S, R_long = 8192, 2048  # 8192 segments of width 512 -> 2048 long rows
P2 = 512
cols2 = jnp.asarray(rng.integers(0, NR, size=(S, P2)).astype(np.int32))
conf2 = jnp.asarray(rng.uniform(1, 5, size=(S, P2)).astype(np.float32))
mask2 = jnp.asarray(np.ones((S, P2), np.float32))
seg_row = jnp.asarray(np.sort(rng.integers(0, R_long, size=(S,))).astype(np.int32))


@jax.jit
def long_pipeline(r, cols, conf, mask, seg_row, otor):
    A, y = half_gram_bij(r, cols, conf, mask)
    Ar = jnp.zeros((R_long, k * k), jnp.float32).at[seg_row].add(A.reshape(S, k * k))
    yr = jnp.zeros((R_long, k), jnp.float32).at[seg_row].add(y)
    A_l = Ar.reshape(R_long, k, k).transpose(1, 2, 0) + otor[:, :, None]
    return spd_solve_lanes(A_l, yr.T, bt=128)


timeit("long rows: gram+segsum+transpose+GJ", long_pipeline, right, cols2, conf2, mask2, seg_row, otor, entries=S * P2)
