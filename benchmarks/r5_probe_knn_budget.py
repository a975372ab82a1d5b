"""Round-5 kNN-build routing probe: resident vs budget at the bench shape
(uint16 chunk-cap validation; results in PARITY.md round-5 table)."""

import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.ops.knn import normalize_item_matrix, similarity_topk

N_USERS, N_ITEMS, NNZ = 138_000, 27_000, 20_000_000
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

for mdb in (4 << 30, 1 << 30, 512 << 20):
    for rep in range(3):
        tm = {}
        t0 = time.time()
        normed, _ = normalize_item_matrix(iu, explicit=False)
        table = similarity_topk(normed, 64, max_dense_bytes=mdb, timings=tm, user_major=ui)
        dt = time.time() - t0
        print(f"mdb={mdb>>20}MB rep={rep}: {dt:.2f}s  {({k: round(v,2) for k,v in tm.items()})}")
