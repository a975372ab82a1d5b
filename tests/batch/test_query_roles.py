"""
Batch query-input roles (regression for round-3 fix).

ItemListCollection values are TEST items: they must never gate
recommendation (reference: batch/_queries.py TestRequestAdapter
``items_as="test"`` + _runner.py:332 — passing them as candidates leaks the
answer and produced NDCG=1.0).  Mapping values are CANDIDATES and must gate
recommendation.
"""

import numpy as np
import pytest

from lkpy_tpu import batch, topn_pipeline
from lkpy_tpu.data import ItemList, ItemListCollection
from lkpy_tpu.models.basic import PopScorer
from lkpy_tpu.training import TrainingOptions


@pytest.fixture(scope="module")
def pipe(ml_ds):
    p = topn_pipeline(PopScorer(), n=20)
    p.train(ml_ds, TrainingOptions(rng=42))
    return p


def test_ilc_values_do_not_gate_recommend(pipe, ml_ds):
    """Recommending for ILC keys must ignore the held-out lists."""
    uid = int(ml_ds.users.ids[0])
    rare = ml_ds.items.ids[-3:]  # long-tail items a Pop recommender won't pick
    test = ItemListCollection(["user_id"])
    test.add(ItemList(item_ids=rare), uid)
    res = batch.recommend(pipe, test, n=20, device=False)
    recs = res.lookup(uid)
    assert len(recs) == 20
    # if the test list gated recommendation, the output would be ⊆ rare
    assert not set(recs.ids()).issubset(set(rare.tolist()))


def test_mapping_values_gate_recommend(pipe, ml_ds):
    uid = int(ml_ds.users.ids[0])
    cands = ml_ds.items.ids[:50]
    res = batch.recommend(pipe, {uid: ItemList(item_ids=cands)}, n=10, device=False)
    recs = res.lookup(uid)
    assert len(recs) == 10
    assert set(recs.ids()).issubset(set(cands.tolist()))


def test_ilc_values_feed_score(pipe, ml_ds):
    """Scoring over an ILC scores exactly the held-out items."""
    uid = int(ml_ds.users.ids[0])
    items = ml_ds.items.ids[:5]
    test = ItemListCollection(["user_id"])
    test.add(ItemList(item_ids=items), uid)
    res = batch.score(pipe, test)
    out = res.lookup(uid)
    assert list(out.ids()) == list(items)
