"""
DatasetBuilder error and edge paths (VERDICT r2 #9; reference analog:
tests/data/ builder error tests, e.g. test_dsbuild_* in the reference suite).
"""

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import DatasetBuilder
from lkpy_tpu.diagnostics import DataError


def _ratings_df():
    return pd.DataFrame(
        {
            "user_id": [1, 1, 2, 3],
            "item_id": [10, 11, 10, 12],
            "rating": [4.0, 3.0, 5.0, 2.0],
        }
    )


def test_duplicate_entity_ids_error():
    b = DatasetBuilder()
    b.add_entities("item", [1, 2, 3])
    with pytest.raises(DataError, match="duplicate"):
        b.add_entities("item", [3, 4])


def test_duplicate_entity_ids_overwrite():
    b = DatasetBuilder()
    b.add_entities("item", [1, 2, 3])
    b.add_entities("item", [3, 4], duplicates="overwrite")
    b.add_entities("user", [1])
    b.add_interactions(
        "rating", pd.DataFrame({"user_id": [1], "item_id": [4], "rating": [3.0]}), missing="error"
    )
    ds = b.build()
    assert set(ds.items.ids.tolist()) == {1, 2, 3, 4}


def test_relationship_needs_two_entities():
    b = DatasetBuilder()
    with pytest.raises(DataError, match="2 entity classes"):
        b.add_relationships("rating", pd.DataFrame({"user_id": [1]}), entities=["user"])


def test_missing_id_column():
    b = DatasetBuilder()
    b.add_entities("user", [1])
    b.add_entities("item", [10])
    with pytest.raises(DataError, match="neither"):
        b.add_relationships(
            "rating", pd.DataFrame({"user_id": [1], "thing": [10]}), entities=["user", "item"]
        )


def test_unknown_entity_class_error_and_insert():
    df = _ratings_df()
    b = DatasetBuilder()
    with pytest.raises(DataError, match="unknown entity class"):
        b.add_relationships("rating", df, entities=["user", "item"], missing="error")
    b2 = DatasetBuilder()
    b2.add_interactions("rating", df, missing="insert")
    ds = b2.build()
    assert ds.user_count == 3
    assert ds.item_count == 3


def test_unknown_ids_error_filter_insert():
    df = _ratings_df()
    base = DatasetBuilder()
    base.add_entities("user", [1, 2, 3])
    base.add_entities("item", [10, 11])  # 12 missing

    b = DatasetBuilder()
    b.add_entities("user", [1, 2, 3])
    b.add_entities("item", [10, 11])
    with pytest.raises(DataError, match="unknown item IDs"):
        b.add_relationships("rating", df, entities=["user", "item"], missing="error")

    b = DatasetBuilder()
    b.add_entities("user", [1, 2, 3])
    b.add_entities("item", [10, 11])
    b.add_relationships("rating", df, entities=["user", "item"], missing="filter", interaction=True)
    ds = b.build()
    assert ds.interaction_count == 3  # the (3, 12) row filtered

    b = DatasetBuilder()
    b.add_entities("user", [1, 2, 3])
    b.add_entities("item", [10, 11])
    b.add_relationships("rating", df, entities=["user", "item"], missing="insert", interaction=True)
    ds = b.build()
    assert ds.interaction_count == 4
    assert 12 in ds.items.ids.tolist()


def test_num_column_without_vocabulary():
    b = DatasetBuilder()
    with pytest.raises(DataError, match="no vocabulary"):
        b.add_relationships(
            "rating",
            pd.DataFrame({"user_num": [0], "item_num": [0]}),
            entities=["user", "item"],
        )


def test_repeats_disallowed():
    df = pd.DataFrame({"user_id": [1, 1], "item_id": [10, 10], "rating": [4.0, 5.0]})
    b = DatasetBuilder()
    b.add_entities("user", [1])
    b.add_entities("item", [10])
    with pytest.raises(DataError, match="repeated"):
        b.add_relationships(
            "rating", df, entities=["user", "item"], allow_repeats=False, interaction=True
        )


def test_filter_interactions_by_time():
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "item_id": [10, 11, 10],
            "rating": [4.0, 3.0, 5.0],
            "timestamp": [100, 200, 300],
        }
    )
    b = DatasetBuilder()
    b.add_interactions("rating", df, missing="insert")
    b.filter_interactions(min_time=150, max_time=250)
    ds = b.build()
    assert ds.interaction_count == 1


def test_binarize_remove_and_zero():
    df = _ratings_df()
    b = DatasetBuilder()
    b.add_interactions("rating", df, missing="insert")
    b.binarize_ratings(min_rating=3.5, method="remove")
    ds = b.build()
    assert ds.interaction_count == 2  # ratings 4.0 and 5.0 survive

    b2 = DatasetBuilder()
    b2.add_interactions("rating", df, missing="insert")
    b2.binarize_ratings(min_rating=3.5, method="zero")
    ds2 = b2.build()
    mat = ds2.interaction_matrix().csr("rating")
    assert ds2.interaction_count == 4
    vals = np.sort(mat.values)
    np.testing.assert_array_equal(vals, [0.0, 0.0, 1.0, 1.0])


def test_string_ids_round_trip(tmp_path):
    df = pd.DataFrame(
        {"user_id": ["alice", "bob", "alice"], "item_id": ["x", "x", "y"], "rating": [1.0, 2.0, 3.0]}
    )
    b = DatasetBuilder("strings")
    b.add_interactions("rating", df, missing="insert")
    ds = b.build()
    assert set(ds.users.ids.tolist()) == {"alice", "bob"}
    ds.save(tmp_path / "ds")
    from lkpy_tpu.data import Dataset

    ds2 = Dataset.load(tmp_path / "ds")
    assert set(ds2.users.ids.tolist()) == {"alice", "bob"}
    assert ds2.interaction_count == 3


def test_empty_interactions_build():
    b = DatasetBuilder()
    b.add_entities("user", [1, 2])
    b.add_entities("item", [10])
    b.add_relationships(
        "rating",
        pd.DataFrame({"user_id": pd.Series([], dtype=np.int64), "item_id": pd.Series([], dtype=np.int64)}),
        entities=["user", "item"],
        interaction=True,
    )
    ds = b.build()
    assert ds.interaction_count == 0
    assert ds.user_count == 2


def test_scalar_attribute_lookup():
    b = DatasetBuilder()
    b.add_entities("item", [10, 11, 12])
    b.add_entities("user", [1])
    b.add_scalar_attribute("item", "year", [10, 12], [1999, 2004])
    b.add_interactions(
        "rating", pd.DataFrame({"user_id": [1], "item_id": [10], "rating": [4.0]}), missing="error"
    )
    ds = b.build()
    ents = ds.entities("item")
    vals = ents.attribute("year")
    nums = ds.items.numbers([10, 12])
    assert vals.iloc[nums[0]] == 1999
    assert vals.iloc[nums[1]] == 2004
