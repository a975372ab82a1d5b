"""Tunnel probe refinement: isolate readback (fresh arrays), upload-only
loops, dispatch-on-fresh-upload vs dispatch-on-resident."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def med(ts):
    return float(np.median(ts))


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    tiny = jnp.zeros(8, jnp.float32)
    np.asarray(tiny)

    # 1. readback with FRESH device arrays each rep (no host-copy cache)
    mk = jax.jit(lambda s, n: jnp.full((n,), s), static_argnames="n")
    for mb in (0.0625, 1, 4, 16):
        n = int(mb * (1 << 20) // 4)
        ts = []
        for r in range(5):
            dev = mk(jnp.float32(r), n)
            dev.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(dev)
            ts.append(time.perf_counter() - t0)
        t = med(ts)
        print(f"readback fresh {mb:>7.4g} MB: {t * 1e3:7.1f} ms  ({mb / t:6.1f} MB/s)")

    # 2. sixteen 512KB uploads, sync once at the end (is device_put async?)
    chunk = np.zeros((1024, 128), np.int32)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        devs = [jax.device_put(chunk) for _ in range(16)]
        devs[-1].block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"16x upload 512KB (sync once): {med(ts) * 1e3:.1f} ms")

    # 3. one 8MB upload, sync
    big = np.zeros((16, 1024, 128), np.int32)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_put(big).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"1x upload 8MB: {med(ts) * 1e3:.1f} ms")

    # 4. dispatch x16 on RESIDENT inputs (pre-uploaded, distinct buffers)
    g = jax.jit(lambda x: jnp.sum(x, axis=1))
    res = [jax.device_put(chunk) for _ in range(16)]
    for r in res:
        r.block_until_ready()
    g(res[0]).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        outs = [g(r) for r in res]
        float(jnp.sum(outs[-1]))
        ts.append(time.perf_counter() - t0)
    print(f"16x dispatch on resident inputs + sync: {med(ts) * 1e3:.1f} ms")

    # 5. dispatch x16 on device-side SLICES of one resident big buffer
    dbig = jax.device_put(big)
    dbig.block_until_ready()
    g2 = jax.jit(lambda x, k: jnp.sum(x[k], axis=1), static_argnames="k")
    g2(dbig, 0).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        outs = [g2(dbig, k) for k in range(16)]
        float(jnp.sum(outs[-1]))
        ts.append(time.perf_counter() - t0)
    print(f"16x dispatch on slices of one resident buffer + sync: {med(ts) * 1e3:.1f} ms")

    # 6. ONE program scanning all 16 chunks + sync
    g3 = jax.jit(lambda x: jnp.sum(x, axis=2).reshape(-1, x.shape[-2] and x.shape[1]))
    g3 = jax.jit(lambda x: jax.lax.map(lambda c: jnp.sum(c, axis=1), x))
    g3(dbig).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = g3(dbig)
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    print(f"1x scanned program over 16 chunks + sync: {med(ts) * 1e3:.1f} ms")

    # 7. upload+dispatch+readback pipeline for the REAL serving shapes:
    #    16384 users, top-100 -> readback (16384,100) f32 + int32
    topv = mk(jnp.float32(1), 16384 * 100)
    topi = mk(jnp.float32(2), 16384 * 100)
    topv.block_until_ready(), topi.block_until_ready()
    ts = []
    for r in range(5):
        v = mk(jnp.float32(r + 3), 16384 * 100)
        i = mk(jnp.float32(r + 103), 16384 * 100)
        v.block_until_ready(), i.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(v), np.asarray(i)
        ts.append(time.perf_counter() - t0)
    print(f"readback 2x 6.25MB fresh (16k users top-100): {med(ts) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
