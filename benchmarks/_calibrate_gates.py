"""Calibration run: measure RMSE / NDCG@20 for every model family via
quick_measure_model so we can set accuracy-gate thresholds
(VERDICT.md next-round item 1).  Temporary script — not part of the package.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import json
import time
import traceback

import jax

jax.config.update("jax_platforms", "cpu")

from lkpy_tpu.data import from_interactions_df
from lkpy_tpu.data.movielens import load_movielens, load_movielens_df
from lkpy_tpu.metrics import quick_measure_model
from lkpy_tpu.random import set_global_rng

ML_PATH = "/root/reference/data/ml-latest-small"

set_global_rng(42)
ml_ds = load_movielens(ML_PATH)
ml_ratings = load_movielens_df(ML_PATH)
counts = ml_ratings.groupby("item_id").size()
dense = ml_ratings[ml_ratings.item_id.isin(counts[counts >= 20].index)]
ml_dense_ds = from_interactions_df(dense)

from lkpy_tpu.models.als import BiasedMFScorer, ImplicitMFScorer
from lkpy_tpu.models.association import AssociationScorer
from lkpy_tpu.models.basic import PopScorer
from lkpy_tpu.models.bias import BiasScorer
from lkpy_tpu.models.ease import EASEScorer
from lkpy_tpu.models.flexmf import FlexMFExplicitScorer, FlexMFImplicitScorer
from lkpy_tpu.models.funksvd import FunkSVDScorer
from lkpy_tpu.models.knn import ItemKNNScorer, UserKNNScorer
from lkpy_tpu.models.lightgcn import LightGCNScorer
from lkpy_tpu.models.nmf import NMFScorer
from lkpy_tpu.models.slim import SLIMScorer
from lkpy_tpu.models.svd import BiasedSVDScorer

# (name, scorer factory, predicts_ratings, use dense ds)
CASES = [
    ("Bias", lambda: BiasScorer(), True, False),
    ("BiasedMF", lambda: BiasedMFScorer(BiasedMFScorer.validate_config({"features": 32, "epochs": 10})), True, False),
    ("ImplicitMF", lambda: ImplicitMFScorer(ImplicitMFScorer.validate_config({"features": 32, "epochs": 10})), False, False),
    ("ItemKNN-E", lambda: ItemKNNScorer(), True, True),
    ("ItemKNN-E-sparse", lambda: ItemKNNScorer(), True, False),
    ("ItemKNN-I", lambda: ItemKNNScorer(ItemKNNScorer.validate_config({"feedback": "implicit"})), False, False),
    ("UserKNN-E", lambda: UserKNNScorer(), True, True),
    ("UserKNN-E-sparse", lambda: UserKNNScorer(), True, False),
    ("UserKNN-I", lambda: UserKNNScorer(UserKNNScorer.validate_config({"feedback": "implicit"})), False, False),
    ("FunkSVD", lambda: FunkSVDScorer(FunkSVDScorer.validate_config({"features": 32, "epochs": 30})), True, False),
    ("SLIM", lambda: SLIMScorer(), False, False),
    ("EASE", lambda: EASEScorer(), False, False),
    ("Association", lambda: AssociationScorer(), False, False),
    ("Pop", lambda: PopScorer(), False, False),
    ("FlexMF-E", lambda: FlexMFExplicitScorer(FlexMFExplicitScorer.validate_config({"features": 32, "epochs": 10})), True, False),
    ("FlexMF-logistic", lambda: FlexMFImplicitScorer(FlexMFImplicitScorer.validate_config({"features": 32, "epochs": 10})), False, False),
    ("FlexMF-BPR", lambda: FlexMFImplicitScorer(FlexMFImplicitScorer.validate_config({"preset": "bpr", "features": 32, "epochs": 10})), False, False),
    ("FlexMF-WARP", lambda: FlexMFImplicitScorer(FlexMFImplicitScorer.validate_config({"preset": "warp", "features": 32, "epochs": 10})), False, False),
    ("LightGCN", lambda: LightGCNScorer(LightGCNScorer.validate_config({"features": 32, "epochs": 10})), False, False),
    ("BiasedSVD", lambda: BiasedSVDScorer(BiasedSVDScorer.validate_config({"features": 32})), True, False),
    ("NMF", lambda: NMFScorer(NMFScorer.validate_config({"features": 32})), False, False),
]

results = {}
for name, make, pred, use_dense in CASES:
    ds = ml_dense_ds if use_dense else ml_ds
    t0 = time.time()
    try:
        res = quick_measure_model(make(), ds, predicts_ratings=pred, rng=42, user_frac=0.5)
        summ = res.list_summary()["mean"]
        row = {"ndcg": float(summ.get("NDCG@20", float("nan"))), "secs": round(time.time() - t0, 1)}
        if pred:
            row["rmse"] = float(summ.get("RMSE", float("nan")))
        results[name] = row
        print(f"CAL {name}: {json.dumps(row)}", flush=True)
    except Exception:
        print(f"CAL {name}: FAILED in {time.time()-t0:.1f}s", flush=True)
        traceback.print_exc()

print("CAL-FINAL " + json.dumps(results), flush=True)
