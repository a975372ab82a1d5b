"""Serving-path probe: the bench's product serving section in isolation
(27k-item fold path + 500k-item approx path) against the grouped O(1)
transport engine.  Run on the real TPU."""

from __future__ import annotations

import sys
import time
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import pandas as pd

from lkpy_tpu.batch.device import device_recommend
from lkpy_tpu.data import from_interactions_df
from lkpy_tpu.models.als import ImplicitMFScorer

N_USERS = 138_000
N_ITEMS = 27_000
NNZ = 18_000_000
K = 64


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(42)
    # popularity-skewed history like the bench
    item_w = 1.0 / np.arange(1, N_ITEMS + 1) ** 0.8
    cdf = np.cumsum(item_w / item_w.sum())
    users = rng.integers(0, N_USERS, size=NNZ).astype(np.int64)
    items = np.searchsorted(cdf, rng.random(NNZ)).astype(np.int64)
    key = users * N_ITEMS + items
    uniq = np.unique(key)
    users, items = (uniq // N_ITEMS), (uniq % N_ITEMS)
    t0 = time.time()
    ds = from_interactions_df(pd.DataFrame({"user_id": users, "item_id": items}))
    matrix = ds.interaction_matrix()
    matrix.csr("rating")
    print(f"dataset: {len(users)} nnz ({time.time() - t0:.1f}s)", file=sys.stderr)

    from lkpy_tpu.ops import als as als_ops
    import jax.numpy as jnp

    scorer = ImplicitMFScorer(ImplicitMFScorer.validate_config({"features": K, "epochs": 10}))
    scorer.users = ds.users
    scorer.items = ds.items
    scorer.user_embeddings = rng.standard_normal((len(ds.users.ids), K)).astype(np.float32) * 0.1
    scorer.item_embeddings = rng.standard_normal((len(ds.items.ids), K)).astype(np.float32) * 0.1
    scorer._OtOr = np.asarray(
        als_ops.implicit_otor(jnp.asarray(scorer.item_embeddings), jnp.float32(0.1))
    )

    serve_users = rng.choice(np.asarray(ds.users.ids), size=16384, replace=False)
    tm: dict = {}
    t0 = time.time()
    device_recommend(scorer, serve_users, 100, matrix, timings=tm)  # warm
    print(f"warm call: {time.time() - t0:.1f}s, ops={tm.get('tunnel_ops')}", file=sys.stderr)
    for lbl, dt, nb in tm.get("trace", []):
        print(f"  {lbl}: {dt * 1e3:8.1f} ms  {nb / 1e6:.2f} MB", file=sys.stderr)

    reps = 4
    t0 = time.time()
    for _ in range(reps):
        out = device_recommend(scorer, serve_users, 100, matrix, timings=tm)
    dt = time.time() - t0
    print(f"27k fold-path qps (sequential): {len(serve_users) * reps / dt:.0f} ({dt / reps:.3f}s/batch)")

    # pipelined: enqueue every batch, then drain — batch N+1 compute
    # overlaps batch N readback
    from lkpy_tpu.batch.device import device_recommend_async

    t0 = time.time()
    handles = [
        device_recommend_async(scorer, serve_users, 100, matrix, timings=tm) for _ in range(reps)
    ]
    outs = [h.result() for h in handles]
    out = outs[-1]
    dt = time.time() - t0
    print(f"27k fold-path qps (pipelined): {len(serve_users) * reps / dt:.0f} ({dt / reps:.3f}s/batch)")
    print(f"  last-rep ops={tm['tunnel_ops']} enqueue={tm['enqueue_s']:.3f}s readback={tm['readback_s']:.3f}s")
    for lbl, dt_, nb in tm.get("trace", []):
        print(f"  {lbl}: {dt_ * 1e3:8.1f} ms  {nb / 1e6:.2f} MB")

    # sanity: history exclusion + known ids
    il = out.lookup(int(serve_users[0]))
    hist = ds.user_row(int(serve_users[0]))
    assert not np.isin(il.ids(), hist.ids()).any(), "history leak!"
    assert len(il) == 100
    print("history exclusion OK")

    # ---- 500k approx path --------------------------------------------------
    n_big = 500_000
    n_su = 8192
    hist_len = 100
    su = np.repeat(np.arange(n_su, dtype=np.int64), hist_len)
    si = rng.integers(0, n_big, size=n_su * hist_len).astype(np.int64)
    big_ds = from_interactions_df(pd.DataFrame({"user_id": su, "item_id": si}))
    big_matrix = big_ds.interaction_matrix()
    big_matrix.csr("rating")
    big_scorer = SimpleNamespace(
        user_embeddings=rng.standard_normal((n_su, K)).astype(np.float32),
        item_embeddings=rng.standard_normal((len(big_ds.items.ids), K)).astype(np.float32),
        config=SimpleNamespace(user_embeddings="prefer"),
    )
    big_users = np.arange(n_su, dtype=np.int64)
    t0 = time.time()
    device_recommend(big_scorer, big_users, 100, big_matrix, timings=tm)
    print(f"500k warm: {time.time() - t0:.1f}s ops={tm.get('tunnel_ops')}", file=sys.stderr)
    t0 = time.time()
    for _ in range(reps):
        device_recommend(big_scorer, big_users, 100, big_matrix, timings=tm)
    dt = time.time() - t0
    print(f"500k approx-path qps: {n_su * reps / dt:.0f} ({dt / reps:.3f}s/batch)")
    print(f"  last-rep ops={tm['tunnel_ops']} enqueue={tm['enqueue_s']:.3f}s readback={tm['readback_s']:.3f}s")


if __name__ == "__main__":
    main()
