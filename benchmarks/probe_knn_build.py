"""kNN build probe at the bench shape (27k items, ~16.7M nnz implicit)."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.knn import normalize_item_matrix, similarity_topk

N_USERS = 138_000
N_ITEMS = 27_000
NNZ = 20_000_000


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(42)
    item_w = 1.0 / np.arange(1, N_ITEMS + 1) ** 0.8
    cdf = np.cumsum(item_w / item_w.sum())
    users = rng.integers(0, N_USERS, size=NNZ).astype(np.int64)
    items = np.searchsorted(cdf, rng.random(NNZ)).astype(np.int64)
    uniq = np.unique(users * N_ITEMS + items)
    users, items = uniq // N_ITEMS, uniq % N_ITEMS
    vals = np.full(len(users), 40.0, dtype=np.float32)
    ui = CSR.from_coo(users, items, vals, (N_USERS, N_ITEMS))
    iu = ui.transpose()
    print(f"nnz={iu.nnz}", file=sys.stderr)

    t0 = time.time()
    normed, _ = normalize_item_matrix(iu, explicit=False)
    print(f"normalize: {time.time() - t0:.2f}s")

    mdb = 512 << 20
    for rep in range(6):
        um = ui if rep % 2 == 0 else None
        tm: dict = {}
        t0 = time.time()
        normed, _ = normalize_item_matrix(iu, explicit=False)
        table = similarity_topk(normed, 64, max_dense_bytes=mdb, timings=tm, user_major=um)
        dt = time.time() - t0
        tmr = {k: round(v, 2) for k, v in tm.items()}
        mode = "resident" if um is not None else "packed2 "
        print(f"build {mode} rep={rep}: {dt:.2f}s  {tmr}")


if __name__ == "__main__":
    main()
