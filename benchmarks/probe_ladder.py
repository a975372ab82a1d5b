"""Bucket-ladder cold-start probe (VERDICT r4 #6): program count vs
occupancy vs throughput at ratio 1.35 (round-4 default) and 2.0."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import K, N_ITEMS, N_USERS, split_holdout, synth_interactions
from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.als import als_epoch, chunk_buckets, chunk_stats, warm_epoch_programs
from lkpy_tpu.ops.sparse import bucket_rows


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(42)
    all_u, all_i = synth_interactions(rng)
    train_mask, _tu, _ti = split_holdout(all_u, all_i, rng)
    tr_u, tr_i = all_u[train_mask], all_i[train_mask]
    nnz = len(tr_u)
    vals = np.full(nnz, 40.0, dtype=np.float32)
    ui = CSR.from_coo(tr_u, tr_i, vals, (N_USERS, N_ITEMS))
    iu = ui.transpose()

    for ratio in (2.0, 1.35):
        ub = chunk_buckets(bucket_rows(ui, field="rating", max_width=4096, ratio=ratio))
        ib = chunk_buckets(bucket_rows(iu, field="rating", max_width=65536, ratio=ratio))
        us, is_ = chunk_stats(ub), chunk_stats(ib)
        occ = (us["real_entries"] + is_["real_entries"]) / (
            us["padded_entries"] + is_["padded_entries"]
        )
        u = jnp.asarray((rng.standard_normal((N_USERS, K)) * 0.01).astype(np.float32))
        i = jnp.asarray((rng.standard_normal((N_ITEMS, K)) * 0.01).astype(np.float32))
        prog: list = []
        t0 = time.time()
        warm_epoch_programs(ub, ib, N_USERS, N_ITEMS, K, "implicit", timings=prog)
        u, i, _d1, _d2 = als_epoch(ub, ib, u, i, 0.1, 0.1, mode="implicit")
        float(jnp.sum(i))
        warm_s = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            u, i, _d1, _d2 = als_epoch(ub, ib, u, i, 0.1, 0.1, mode="implicit")
        float(jnp.sum(i))
        rate = nnz * 2 * 3 / (time.time() - t0)
        total_load = sum(t for _, t in prog)
        print(
            f"ratio {ratio}: {len(prog)} programs, occupancy {occ:.3f}, "
            f"warm {warm_s:.1f}s (load {total_load:.1f}s), {rate / 1e6:.1f}M ex/s"
        )
        for lbl, t in sorted(prog, key=lambda x: -x[1])[:4]:
            print(f"    {lbl}: {t:.1f}s")


if __name__ == "__main__":
    main()
