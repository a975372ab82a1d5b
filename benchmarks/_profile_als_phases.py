"""Honest per-phase ALS epoch timing on the real TPU (readback syncs).

Phases per bucket: gram scan -> solve -> scatter; plus a bf16-gram
experiment.  Uses the bench.py synthetic dataset/bucketing exactly.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import K, N_ITEMS, N_USERS, split_holdout, synth_interactions
from lkpy_tpu.data.matrix import CSR
import lkpy_tpu.ops.als as A
from lkpy_tpu.ops.sparse import bucket_rows


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def main():
    rng = np.random.default_rng(42)
    all_u, all_i = synth_interactions(rng)
    m, _, _ = split_holdout(all_u, all_i, rng)
    tr_u, tr_i = all_u[m], all_i[m]
    vals = np.full(len(tr_u), 40.0, dtype=np.float32)
    ui = CSR.from_coo(tr_u, tr_i, vals, (N_USERS, N_ITEMS))
    iu = ui.transpose()
    u_b = A.chunk_buckets(bucket_rows(ui, field="rating", max_width=4096))
    i_b = A.chunk_buckets(bucket_rows(iu, field="rating", max_width=65536))
    print("data ready", file=sys.stderr, flush=True)

    u = jnp.asarray((rng.standard_normal((N_USERS, K)) * 0.01).astype(np.float32) ** 2)
    i = jnp.asarray((rng.standard_normal((N_ITEMS, K)) * 0.01).astype(np.float32) ** 2)

    A.warm_epoch_programs(u_b, i_b, N_USERS, N_ITEMS, K, "implicit")
    # run one full epoch to settle
    u, i, du, di = A.als_epoch(u_b, i_b, u, i, 0.1, 0.1, mode="implicit")
    sync(di)

    # steady-state full epochs (honest)
    t0 = time.time()
    EP = 3
    for _ in range(EP):
        u, i, du, di = A.als_epoch(u_b, i_b, u, i, 0.1, 0.1, mode="implicit")
    sync(di)
    dt = (time.time() - t0) / EP
    print(f"full epoch: {dt*1000:.0f} ms", flush=True)

    # per-phase on each side
    otor = A.implicit_otor(i, jnp.float32(0.1))
    sync(otor)
    for name, chunks, left, right in (("user", u_b, u, i), ("item", i_b, i, u)):
        apply_update = A._apply_update_fn(None)
        gram_t = solve_t = scat_t = 0.0
        for ch in chunks:
            C, B, _P = ch.cols.shape
            big = C * B >= A._BLOCKED_MIN_ROWS
            t0 = time.time()
            Am, y = A._gram_scan_implicit(ch.cols, ch.values, ch.mask, right, otor)
            sync(y)
            gram_t += time.time() - t0
            t0 = time.time()
            if big:
                xs = A._solve_large_bucket(Am, y)
            else:
                xs = A.batched_spd_solve(Am.reshape(-1, K, K), y.reshape(-1, K)).reshape(y.shape)
            sync(xs)
            solve_t += time.time() - t0
            t0 = time.time()
            lcopy = jnp.array(left)  # fresh (donated)
            out, dsq = apply_update(lcopy, ch.rows, xs, jnp.float32(0.0))
            sync(dsq)
            scat_t += time.time() - t0
        print(f"{name} half: gram {gram_t*1000:.0f} ms, solve {solve_t*1000:.0f} ms, scatter {scat_t*1000:.0f} ms", flush=True)

    # bf16 gram experiment on the biggest user bucket
    ch = max(u_b, key=lambda c: c.cols.shape[0] * c.cols.shape[1] * c.cols.shape[2])
    from functools import partial

    @jax.jit
    def gram_bf16(cols, conf, mask, right, otor):
        def body(_, xs):
            c, v, m = xs
            G = right.astype(jnp.bfloat16)[c]
            cm = (v * m.astype(jnp.float32)).astype(jnp.bfloat16)
            Am = otor[None, :, :] + jnp.einsum(
                "bpi,bp,bpj->bij", G, cm, G, preferred_element_type=jnp.float32
            )
            y = jnp.einsum("bpi,bp->bi", G, ((v + 1.0) * m).astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            return None, (Am, y)

        _, out = jax.lax.scan(body, None, (cols, conf, mask))
        return out

    Am, y = gram_bf16(ch.cols, ch.values, ch.mask, i, otor)
    sync(y)  # compile
    t0 = time.time()
    Am, y = gram_bf16(ch.cols, ch.values, ch.mask, i, otor)
    sync(y)
    bf = time.time() - t0
    t0 = time.time()
    Am2, y2 = A._gram_scan_implicit(ch.cols, ch.values, ch.mask, i, otor)
    sync(y2)
    f32 = time.time() - t0
    C, B, P = ch.cols.shape
    print(f"biggest user bucket ({C}x{B}x{P}): gram f32 {f32*1000:.0f} ms vs bf16 {bf*1000:.0f} ms", flush=True)
    err = float(jnp.max(jnp.abs(Am - Am2)) / (jnp.max(jnp.abs(Am2)) + 1e-9))
    print(f"bf16 gram max rel err: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
