"""Readback strategy probe: the serving path must read ~6-13 MB of top-k
results per 16k-user batch; measure which host-copy strategy is fastest
through the tunnel."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def fresh(n, r, dtype=jnp.float32):
    mk = jax.jit(lambda s: jnp.full((n,), s, dtype), static_argnames=())
    out = mk(jnp.float32(r))
    out.block_until_ready()
    return out


def bench(label, fn, reps=5):
    ts = []
    for r in range(reps):
        ts.append(fn(r))
    t = float(np.median(ts))
    print(f"{label}: {t * 1e3:7.1f} ms")
    return t


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    np.asarray(jnp.zeros(8))

    MB = 1 << 20
    for total_mb in (6.5, 12.5):
        n_total = int(total_mb * MB // 4)
        print(f"--- total {total_mb} MB ---")

        def sync_one(r):
            d = fresh(n_total, r)
            t0 = time.perf_counter()
            np.asarray(d)
            return time.perf_counter() - t0

        bench("  one sync asarray", sync_one)

        def async_one(r):
            d = fresh(n_total, r + 50)
            t0 = time.perf_counter()
            d.copy_to_host_async()
            np.asarray(d)
            return time.perf_counter() - t0

        bench("  copy_to_host_async then asarray", async_one)

        for parts in (4, 16):
            npart = n_total // parts

            def chunked(r, parts=parts, npart=npart):
                ds = [fresh(npart, r * 100 + k) for k in range(parts)]
                t0 = time.perf_counter()
                for d in ds:
                    d.copy_to_host_async()
                for d in ds:
                    np.asarray(d)
                return time.perf_counter() - t0

            bench(f"  {parts}x {total_mb / parts:.2f}MB async-all then asarray", chunked)

        def dget(r):
            d = fresh(n_total, r + 200)
            t0 = time.perf_counter()
            jax.device_get(d)
            return time.perf_counter() - t0

        bench("  jax.device_get", dget)

    # does uint16/bf16 halve the wall clock (i.e. is it bytes-bound)?
    n = int(6.5 * MB // 4)
    mkh = jax.jit(lambda s: jnp.full((n,), s, jnp.bfloat16))

    def half(r):
        d = mkh(jnp.float32(r))
        d.block_until_ready()
        t0 = time.perf_counter()
        d.copy_to_host_async()
        np.asarray(d)
        return time.perf_counter() - t0

    bench("bf16 same element count (3.25 MB)", half)


if __name__ == "__main__":
    main()
