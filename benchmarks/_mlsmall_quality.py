"""Real-data explicit-ALS quality check for bench.py (VERDICT r4 item 8):
train BiasedMF on ml-latest-small with the reference's quick-measure split
and print one JSON line {"rmse": ..., "ndcg": ...}.

Runs on CPU (spawned by bench.py with JAX_PLATFORMS=cpu): the workload is
tiny and the quality number is backend-independent, so the TPU tunnel's
program-load latency is not worth paying here.

Reference window: RMSE 0.89-0.99 on ML-100K
(/root/reference/tests/models/test_als_explicit.py:30); ml-latest-small is a
different dataset (same scale), so the window transfers approximately.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

ML_SMALL = Path(os.environ.get("LKT_ML_SMALL", "/root/reference/data/ml-latest-small"))


def main():
    if not ML_SMALL.exists():
        print(json.dumps({"rmse": None, "ndcg": None, "skipped": "dataset not present"}))
        return
    from lkpy_tpu.data import load_movielens
    from lkpy_tpu.metrics import quick_measure_model
    from lkpy_tpu.models.als import BiasedMFScorer

    ds = load_movielens(str(ML_SMALL))
    res = quick_measure_model(
        BiasedMFScorer(features=32, epochs=10), ds, predicts_ratings=True, rng=42
    )
    g = res.global_metrics()
    print(json.dumps({"rmse": round(float(g["RMSE"]), 4), "ndcg": round(float(g["NDCG@20"]), 4)}))


if __name__ == "__main__":
    main()
