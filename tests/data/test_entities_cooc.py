"""
EntitySet selection/attribute semantics and a hand-computed co-occurrence
oracle (reference: tests/data/test_attribute.py and test_rel_cooc.py exercise
src/lenskit/data/_entities.py and _relationships.py:144-163).
"""

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import from_interactions_df
from lkpy_tpu.diagnostics import FieldError

#            items
#   users    A  B  C
#     1      x  x  .
#     2      x  x  x
#     3      .  .  x
TINY = pd.DataFrame(
    {
        "user_id": [1, 1, 2, 2, 2, 3],
        "item_id": ["A", "B", "A", "B", "C", "C"],
        "rating": [4.0, 3.0, 5.0, 2.0, 1.0, 4.0],
    }
)


@pytest.fixture()
def tiny_ds():
    return from_interactions_df(TINY)


def test_cooc_item_oracle(tiny_ds):
    co = tiny_ds.interactions().co_occurrences("item", dense=True)
    vocab = tiny_ds.items
    a, b, c = (int(vocab.number(x)) for x in ["A", "B", "C"])
    # A&B co-occur for users 1,2; A&C and B&C only for user 2
    assert co[a, b] == 2 and co[b, a] == 2
    assert co[a, c] == 1 and co[c, a] == 1
    assert co[b, c] == 1 and co[c, b] == 1
    # self co-occurrence excluded by default
    assert co[a, a] == 0 and co[b, b] == 0 and co[c, c] == 0


def test_cooc_include_self_diagonal(tiny_ds):
    co = tiny_ds.interactions().co_occurrences("item", include_self=True, dense=True)
    vocab = tiny_ds.items
    a, b, c = (int(vocab.number(x)) for x in ["A", "B", "C"])
    # diagonal = number of users who interacted with the item
    assert co[a, a] == 2 and co[b, b] == 2 and co[c, c] == 2


def test_cooc_user_axis(tiny_ds):
    co = tiny_ds.interactions().co_occurrences("user", dense=True)
    vocab = tiny_ds.users
    u1, u2, u3 = (int(vocab.number(x)) for x in [1, 2, 3])
    # users 1&2 share items A,B; users 2&3 share item C; 1&3 share nothing
    assert co[u1, u2] == 2 and co[u2, u1] == 2
    assert co[u2, u3] == 1 and co[u3, u2] == 1
    assert co[u1, u3] == 0 and co[u3, u1] == 0


def test_cooc_sparse_matches_dense(tiny_ds):
    rel = tiny_ds.interactions()
    dense = rel.co_occurrences("item", dense=True)
    sp = rel.co_occurrences("item")
    np.testing.assert_array_equal(np.asarray(sp.todense()), dense)


def test_cooc_unknown_entity(tiny_ds):
    with pytest.raises(KeyError):
        tiny_ds.interactions().co_occurrences("session")


def test_entity_select_by_ids(tiny_ds):
    sub = tiny_ds.entities("item").select(ids=["C", "A"])
    # the sub-vocabulary canonicalizes (sorts) the selected IDs
    assert set(sub.ids()) == {"A", "C"}
    assert sub.count == 2
    assert len(sub) == 2


def test_entity_select_by_numbers(tiny_ds):
    full = tiny_ds.entities("user")
    sub = full.select(numbers=[1, 2])
    np.testing.assert_array_equal(sub.ids(), full.ids()[[1, 2]])
    # the sub-vocabulary renumbers from 0
    np.testing.assert_array_equal(sub.numbers(), [0, 1])


def test_entity_attribute_missing_raises(tiny_ds):
    with pytest.raises(FieldError):
        tiny_ds.entities("item").attribute("genres")


def test_entity_attribute_set(tiny_ds):
    # attach an item attribute through the builder path and read it back
    from lkpy_tpu.data import DatasetBuilder

    db = DatasetBuilder()
    db.add_interactions(
        "rating", TINY, entities=["user", "item"], missing="insert", allow_repeats=False
    )
    items = sorted(TINY["item_id"].unique())
    db.add_scalar_attribute("item", "popularity", items, np.arange(len(items), dtype=np.float64))
    ds = db.build()
    aset = ds.entities("item").attribute_set("popularity")
    assert aset.name == "popularity"
    assert aset.entity_class == "item"
    assert len(aset) == len(items)
    np.testing.assert_array_equal(aset.ids(), ds.items.ids)
    np.testing.assert_array_equal(aset.numpy(), np.arange(len(items), dtype=np.float64))
    # pandas view is indexed by entity number
    s = aset.pandas()
    assert isinstance(s, pd.Series)
    assert len(s) == len(items)


def test_entity_pandas_includes_id_column(tiny_ds):
    df = tiny_ds.entities("item").pandas()
    assert "item_id" in df.columns
    assert list(df["item_id"]) == list(tiny_ds.items.ids)
