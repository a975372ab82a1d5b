"""
Micro-benchmarks over the data-plane hot ops.

One file standing in for the reference's eight benchmark modules
(reference: tests/benchmarks/benchmark_{index,topn,isin,negatives,il_take,
remove,schema,weighting}.py) — same operations, sized to run in
milliseconds so they double as smoke tests in the normal CPU suite.
"""

import numpy as np
import pandas as pd

from lkpy_tpu.data import ItemList, Vocabulary, from_interactions_df
from lkpy_tpu.data.matrix import CSR

VOCAB_SIZE = 50_000


def _vocab(rng):
    return Vocabulary(rng.choice(VOCAB_SIZE * 100, VOCAB_SIZE, replace=False))


# ---- benchmark_index ------------------------------------------------------
def test_vocab_lookup_single(rng, benchmark):
    v = _vocab(rng)
    q = int(rng.choice(v.ids, 1)[0])
    n = benchmark(lambda: v.number(q))
    assert n >= 0


def test_vocab_lookup_500(rng, benchmark):
    v = _vocab(rng)
    q = rng.choice(v.ids, 500, replace=False)
    nums = benchmark(lambda: v.numbers(q))
    assert len(nums) == 500


def test_native_index_lookup_50k(rng, benchmark):
    v = _vocab(rng)
    q = rng.choice(v.ids, 50_000, replace=True)
    nums = benchmark(lambda: v.numbers(q))
    assert nums.max() < VOCAB_SIZE


# ---- benchmark_topn -------------------------------------------------------
def test_itemlist_topn(rng, benchmark):
    il = ItemList(
        item_ids=np.arange(20_000, dtype=np.int64),
        scores=rng.normal(size=20_000).astype(np.float32),
    )
    top = benchmark(lambda: il.top_n(100))
    assert len(top) == 100


# ---- benchmark_isin / remove / il_take ------------------------------------
def test_itemlist_isin(rng, benchmark):
    a = ItemList(item_ids=rng.choice(10**6, 20_000, replace=False))
    b = ItemList(item_ids=rng.choice(10**6, 5_000, replace=False))
    m = benchmark(lambda: a.isin(b))
    assert m.shape == (20_000,)


def test_itemlist_remove(rng, benchmark):
    a = ItemList(item_ids=rng.choice(10**6, 20_000, replace=False))
    b = ItemList(item_ids=np.asarray(a.ids()[:5_000]))
    kept = benchmark(lambda: a.remove(b))
    assert len(kept) == 15_000


def test_itemlist_take(rng, benchmark):
    il = ItemList(item_ids=np.arange(20_000, dtype=np.int64), scores=np.arange(20_000, dtype=np.float32))
    idx = rng.choice(20_000, 2_000, replace=False)
    sub = benchmark(lambda: il[idx])
    assert len(sub) == 2_000


# ---- benchmark_negatives --------------------------------------------------
def test_sample_negatives(rng, benchmark):
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 2_000, 60_000),
            "item_id": rng.integers(0, 5_000, 60_000),
        }
    ).drop_duplicates()
    ds = from_interactions_df(df)
    matrix = ds.interaction_matrix()
    users = rng.choice(ds.user_count, 4_096, replace=True).astype(np.int32)
    negs = benchmark(lambda: matrix.sample_negatives(users, rng=rng))
    assert negs.shape == (4_096,)


# ---- benchmark_schema -----------------------------------------------------
def test_config_validation(benchmark):
    from lkpy_tpu.models.als import ImplicitMFScorer

    cfg = benchmark(
        lambda: ImplicitMFScorer.validate_config({"features": 32, "epochs": 5}), reps=20
    )
    assert cfg.embedding_size == 32


# ---- benchmark_weighting --------------------------------------------------
def test_knn_normalize(rng, benchmark):
    import scipy.sparse as sps

    from lkpy_tpu.ops.knn import normalize_item_matrix

    mat = sps.random(5_000, 2_000, density=0.01, random_state=42, format="csr")
    mat.data = rng.uniform(0.5, 5.0, mat.nnz).astype(np.float32)
    csr = CSR.from_scipy(mat)
    normed, _ = benchmark(lambda: normalize_item_matrix(csr, explicit=True))
    assert normed.nnz == csr.nnz
