"""Tunnel transport characterization: latency + bandwidth for uploads,
readbacks, and dispatches at several sizes.

The round-4 serving residual argument was a latency *model*; this probe
measures the primitives it assumed so the round-5 serving redesign
(single-upload / async-enqueue / single-readback) can be sized against
real numbers instead.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def median_s(fn, reps=7):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    tiny = jnp.zeros(8, jnp.float32)
    np.asarray(tiny)

    # 1. pure round-trip (dispatch tiny op + scalar readback)
    rt = median_s(lambda: np.asarray(tiny + 1))
    print(f"round-trip (tiny dispatch + sync): {rt * 1e3:.1f} ms")

    # 2. upload bandwidth at several sizes
    for mb in (0.0625, 0.25, 1, 4, 16, 64):
        n = int(mb * (1 << 20) // 4)
        buf = np.zeros(n, np.float32)
        t = median_s(lambda b=buf: jax.device_put(b).block_until_ready(), reps=5)
        bw = mb / t
        print(f"upload {mb:>7.4g} MB: {t * 1e3:7.1f} ms  ({bw:6.1f} MB/s)")

    # 3. readback bandwidth at several sizes (device array already resident)
    for mb in (0.0625, 0.25, 1, 4, 16, 64):
        n = int(mb * (1 << 20) // 4)
        dev = jnp.zeros(n, jnp.float32) + 1
        dev.block_until_ready()
        t = median_s(lambda d=dev: np.asarray(d), reps=5)
        bw = mb / t
        print(f"readback {mb:>7.4g} MB: {t * 1e3:7.1f} ms  ({bw:6.1f} MB/s)")

    # 4. async dispatch cost: N dependent matmul dispatches, sync once.
    a = jnp.zeros((512, 512), jnp.float32) + 0.001
    f = jax.jit(lambda x: x @ a)
    f(a).block_until_ready()

    def chain(n):
        x = a
        for _ in range(n):
            x = f(x)
        return float(jnp.sum(x))

    t1 = median_s(lambda: chain(1), reps=5)
    t16 = median_s(lambda: chain(16), reps=5)
    t64 = median_s(lambda: chain(64), reps=5)
    print(
        f"dispatch chain: 1 op {t1 * 1e3:.1f} ms, 16 ops {t16 * 1e3:.1f} ms, "
        f"64 ops {t64 * 1e3:.1f} ms -> per-dispatch {((t64 - t16) / 48) * 1e3:.2f} ms"
    )

    # 5. interleaved upload+dispatch (the serving enqueue pattern):
    #    per-chunk upload of 512KB then a dispatch, x16 — vs one 8MB upload
    #    then 16 dispatches.
    chunk = np.zeros((1024, 128), np.int32)
    big = np.zeros((16, 1024, 128), np.int32)
    g = jax.jit(lambda x: jnp.sum(x, axis=1))

    def per_chunk():
        outs = []
        for _ in range(16):
            d = jax.device_put(chunk)
            outs.append(g(d))
        return float(jnp.sum(outs[-1]))

    def packed():
        d = jax.device_put(big)
        outs = [g(d[k]) for k in range(16)]
        return float(jnp.sum(outs[-1]))

    per_chunk()
    packed()
    tpc = median_s(per_chunk, reps=5)
    tpk = median_s(packed, reps=5)
    print(f"16x(upload 512KB + dispatch): {tpc * 1e3:.1f} ms; 1x upload 8MB + 16 dispatch: {tpk * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
