"""
String entity IDs through the full stack.

The reference supports arbitrary ID types end-to-end (ints, strings, bytes —
reference: tests/data/test_dataset_ids.py, data/types.py ``EntityId``); on
TPU the device side only ever sees integer *numbers*, so every string-ID
guarantee lives in the host data layer: vocabularies, item lists, splits,
collections, and the pipeline surface.  These tests pin that contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import Dataset, ItemList, ItemListCollection, Vocabulary, from_interactions_df
from lkpy_tpu.metrics import NDCG, RecipRank, RunAnalysis
from lkpy_tpu.models.basic import PopScorer
from lkpy_tpu.models.bias import BiasScorer
from lkpy_tpu.operations import recommend, score
from lkpy_tpu.pipeline import topn_pipeline
from lkpy_tpu.splitting import sample_users
from lkpy_tpu.splitting.holdout import SampleN


@pytest.fixture(scope="module")
def str_df() -> pd.DataFrame:
    rng = np.random.default_rng(1234)
    df = pd.DataFrame(
        {
            "user_id": [f"user-{i:03d}" for i in rng.integers(0, 40, 600)],
            "item_id": [f"item:{j:02d}" for j in rng.integers(0, 30, 600)],
            "rating": rng.integers(1, 6, 600).astype(np.float64),
        }
    )
    return df.drop_duplicates(["user_id", "item_id"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def str_ds(str_df) -> Dataset:
    return from_interactions_df(str_df)


def test_vocab_string_round_trip(str_ds):
    items = str_ds.items
    ids = np.asarray(items.ids)
    assert ids.dtype.kind == "U"
    # numbers() inverts ids() exactly, in sorted-unique order
    nums = items.numbers(ids)
    assert np.array_equal(nums, np.arange(len(items)))
    assert np.array_equal(np.asarray(items.ids)[nums], ids)
    # sorted-unique numbering: ids are lexicographically sorted
    assert np.array_equal(ids, np.sort(ids))


def test_vocab_string_missing_ids(str_ds):
    nums = str_ds.items.numbers(["item:00", "no-such-item", "item:29"], missing="negative")
    assert nums[0] >= 0 and nums[2] >= 0
    assert nums[1] == -1
    with pytest.raises(KeyError):
        str_ds.items.numbers(["no-such-item"], missing="error")


def test_vocab_mixed_length_strings():
    # numbering and lookup must not truncate to the first term's width
    vocab = Vocabulary(["a", "longer-identifier", "mid", "b"])
    assert set(np.asarray(vocab.ids)) == {"a", "b", "longer-identifier", "mid"}
    n = vocab.number("longer-identifier")
    assert np.asarray(vocab.ids)[n] == "longer-identifier"


def test_itemlist_string_ids_vocab_numbers(str_ds):
    ids = np.asarray(str_ds.items.ids)[[3, 1, 7]]
    il = ItemList(item_ids=ids, scores=[0.5, 0.2, 0.9])
    nums = il.numbers(vocabulary=str_ds.items)
    assert np.array_equal(np.asarray(str_ds.items.ids)[nums], ids)
    # top-n keeps id association
    top = il.top_n(2)
    assert list(top.ids()) == [ids[2], ids[0]]


def test_matrix_rows_match_pandas(str_df, str_ds):
    m = str_ds.interaction_matrix()
    for uid in ["user-000", "user-017"]:
        row = m.row_items(uid)
        want = str_df.loc[str_df["user_id"] == uid].sort_values("item_id")
        assert list(row.ids()) == list(want["item_id"])
        assert np.allclose(np.asarray(row.field("rating")), want["rating"].to_numpy())


def test_stats_index_is_string(str_df, str_ds):
    stats = str_ds.item_stats()
    assert stats.index.dtype == object or stats.index.dtype.kind in "UO"
    counts = str_df.groupby("item_id").size()
    assert np.array_equal(
        stats["count"].sort_index().to_numpy(), counts.sort_index().to_numpy()
    )


def test_save_load_preserves_string_ids(str_ds, tmp_path):
    str_ds.save(tmp_path / "ds")
    back = Dataset.load(tmp_path / "ds")
    assert np.array_equal(np.asarray(back.items.ids), np.asarray(str_ds.items.ids))
    assert np.array_equal(np.asarray(back.users.ids), np.asarray(str_ds.users.ids))
    row_a = str_ds.user_row("user-003")
    row_b = back.user_row("user-003")
    assert list(row_a.ids()) == list(row_b.ids())


def test_split_keys_are_string_ids(str_ds):
    split = sample_users(str_ds, 8, SampleN(2, rng=7), rng=7)
    for key, il in split.test:
        assert str(key.user_id).startswith("user-")
        assert len(il) == 2
        # held-out items absent from the training row
        train_row = split.train.user_row(str(key.user_id))
        train_ids = set() if train_row is None else set(train_row.ids())
        assert not (set(il.ids()) & train_ids)


def test_ilc_string_keys_round_trip(str_ds):
    ilc = ItemListCollection(["user_id"])
    ilc.add(ItemList(item_ids=["item:01", "item:05"]), "user-001")
    ilc.add(ItemList(item_ids=["item:02"]), "user-002")
    df = ilc.to_df()
    assert df["user_id"].dtype == object or df["user_id"].dtype.kind in "UO"
    back = ItemListCollection.from_df(df, ["user_id"])
    assert len(back) == 2
    assert list(back.lookup("user-001").ids()) == ["item:01", "item:05"]


@pytest.mark.parametrize("scorer_cls", [PopScorer, BiasScorer])
def test_pipeline_end_to_end_string_ids(str_ds, scorer_cls):
    split = sample_users(str_ds, 8, SampleN(2, rng=11), rng=11)
    pipe = topn_pipeline(scorer_cls(), n=5)
    pipe.train(split.train)
    recs = recommend(pipe, "user-001", 5)
    assert len(recs) == 5
    assert all(str(i).startswith("item:") for i in recs.ids())
    # scoring specific string items returns aligned scores
    sc = score(pipe, "user-001", ItemList(item_ids=["item:00", "item:10"]))
    assert len(sc) == 2
    assert list(sc.ids()) == ["item:00", "item:10"]


def test_batch_and_metrics_string_ids(str_ds):
    from lkpy_tpu.batch import recommend as batch_recommend

    split = sample_users(str_ds, 8, SampleN(2, rng=13), rng=13)
    pipe = topn_pipeline(PopScorer(), n=10)
    pipe.train(split.train)
    recs = batch_recommend(pipe, list(split.test.keys()), 10)
    assert len(recs) == len(split.test)
    ra = RunAnalysis()
    ra.add_metric(NDCG(10))
    ra.add_metric(RecipRank())
    res = ra.measure(recs, split.test)
    summary = res.list_summary()
    assert np.isfinite(summary.loc["NDCG@10", "mean"])
    assert 0.0 <= summary.loc["NDCG@10", "mean"] <= 1.0
