"""Temp: microbench gram formulations for the implicit bucket solve."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

B, P, K, N = 15625, 256, 64, 27_000


def timeit(name, f, *a, n=5):
    r = f(*a)
    float(jnp.sum(r))
    t = time.time()
    for _ in range(n):
        r = f(*a)
    float(jnp.sum(r))
    print(f"{name}: {(time.time() - t) / n * 1000:.1f} ms", flush=True)


rng = np.random.default_rng(0)
cols = jnp.asarray(rng.integers(0, N, (B, P)).astype(np.int32))
conf = jnp.asarray(rng.random((B, P)).astype(np.float32) * 40)
mask = jnp.asarray(rng.random((B, P)) < 0.5)
right = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32))


@jax.jit
def three_operand(cols, conf, mask, right):
    G = right[cols]
    m = mask.astype(right.dtype)
    cm = conf * m
    A = jnp.einsum("bpi,bp,bpj->bij", G, cm, G, preferred_element_type=jnp.float32)
    return A


@jax.jit
def staged(cols, conf, mask, right):
    G = right[cols]
    cm = (conf * mask.astype(right.dtype))[:, :, None]
    A = jnp.einsum("bpi,bpj->bij", G * cm, G, preferred_element_type=jnp.float32)
    return A


@jax.jit
def gather_only(cols, conf, mask, right):
    G = right[cols]
    return jnp.sum(G, axis=1)


@jax.jit
def staged_bf16(cols, conf, mask, right):
    rb = right.astype(jnp.bfloat16)
    G = rb[cols]
    cm = (conf * mask.astype(jnp.float32))[:, :, None].astype(jnp.bfloat16)
    A = jnp.einsum("bpi,bpj->bij", G * cm, G, preferred_element_type=jnp.float32)
    return A


timeit("gather only", gather_only, cols, conf, mask, right)
timeit("staged 2-op", staged, cols, conf, mask, right)
timeit("3-operand", three_operand, cols, conf, mask, right)
timeit("staged bf16", staged_bf16, cols, conf, mask, right)
