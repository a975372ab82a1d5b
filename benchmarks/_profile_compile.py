"""Measure per-shape compile times for the ALS epoch's constituent programs."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from functools import partial
from lkpy_tpu.ops.als import solve_implicit_bucket, implicit_otor

K = 64
# (C, B, P) shapes from the bench item/user sides
SHAPES = [
    (1, 27496, 128, "scan"),   # user main bucket, scanned C=5 -> body compile
    (5, 27496, 128, "scanC5"),
    (1, 11928, 256, "plain"),
    (1, 3712, 1024, "plain"),
    (1, 608, 4096, "plain"),
    (1, 40, 16384, "plain"),
    (1, 8, 65536, "plain"),
]

right = jnp.zeros((27000, K), jnp.float32)
otor = implicit_otor(right, jnp.float32(0.1))

def body_fn(right, otor, cols, conf, mask):
    return solve_implicit_bucket(cols, conf, mask, right, otor)

def scan_fn(right, otor, cols, conf, mask):
    def b(_, xs):
        c, v, m = xs
        return None, solve_implicit_bucket(c, v, m, right, otor)
    _, out = jax.lax.scan(b, None, (cols, conf, mask))
    return out

for C, B, P, kind in SHAPES:
    cols = jnp.zeros((C, B, P) if kind.startswith("scanC") else (B, P), jnp.int32)
    conf = jnp.zeros_like(cols, dtype=jnp.float32)
    mask = jnp.zeros_like(cols, dtype=jnp.bool_)
    fn = scan_fn if kind.startswith("scanC") else body_fn
    t0 = time.time()
    lowered = jax.jit(fn).lower(right, otor, cols, conf, mask)
    compiled = lowered.compile()
    print(f"({C},{B},{P}) {kind}: compile {time.time()-t0:.1f}s", flush=True)
