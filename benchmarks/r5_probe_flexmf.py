"""Round-5 isolated FlexMF-BPR epoch-throughput probe (contention control
for the bench number; results in PARITY.md round-5 table)."""

import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, pandas as pd
from lkpy_tpu.data import from_interactions_df
from lkpy_tpu.models.flexmf import FlexMFImplicitScorer
from lkpy_tpu.training import TrainingOptions

rng = np.random.default_rng(7)
N_USERS, N_ITEMS, NNZ = 138_000, 27_000, 20_000_000
item_w = 1.0 / np.arange(1, N_ITEMS + 1) ** 0.8
cdf = np.cumsum(item_w / item_w.sum())
users = rng.integers(0, N_USERS, size=NNZ).astype(np.int64)
items = np.searchsorted(cdf, rng.random(NNZ)).astype(np.int64)
uniq = np.unique(users * N_ITEMS + items)
users, items = uniq // N_ITEMS, uniq % N_ITEMS
ds = from_interactions_df(pd.DataFrame({"user_id": users, "item_id": items}))
nnz = len(users)
print(f"nnz={nnz}", file=sys.stderr)
fmf = FlexMFImplicitScorer(FlexMFImplicitScorer.validate_config(
    {"embedding_size": 64, "loss": "pairwise", "batch_size": 32768, "epochs": 5}))
t0 = time.time()
tr = fmf.create_trainer(ds, TrainingOptions(rng=42))
tr.train_epoch()
print(f"warm {time.time()-t0:.1f}s")
for rep in range(3):
    t0 = time.time()
    tr.train_epoch()
    dt = time.time() - t0
    print(f"epoch {rep}: {dt:.2f}s -> {nnz/dt:.3e} ex/s")
