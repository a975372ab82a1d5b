"""
Dataset/MatrixRelationshipSet semantic tests (VERDICT r2 #9; reference
analog: tests/data/test_dataset.py + test_relationships.py, far larger).
"""

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import from_interactions_df


@pytest.fixture(scope="module")
def ds():
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3],
            "item_id": [10, 11, 12, 10, 12, 11],
            "rating": [4.0, 3.0, 5.0, 2.0, 4.0, 1.0],
            "timestamp": [5, 6, 7, 8, 9, 10],
        }
    )
    return from_interactions_df(df)


def test_item_stats(ds):
    st = ds.item_stats()
    # count per item: 10 -> 2, 11 -> 2, 12 -> 2
    assert st.loc[10, "count"] == 2
    assert st.loc[11, "count"] == 2
    # mean rating of item 10 = (4+2)/2
    assert st.loc[10, "mean_rating"] == pytest.approx(3.0)


def test_user_stats(ds):
    st = ds.user_stats()
    assert st.loc[1, "count"] == 3
    assert st.loc[3, "count"] == 1
    assert st.loc[2, "mean_rating"] == pytest.approx(3.0)


def test_user_row(ds):
    il = ds.user_row(1)
    assert set(il.ids().tolist()) == {10, 11, 12}
    np.testing.assert_allclose(np.sort(il.field("rating")), [3.0, 4.0, 5.0])
    assert ds.user_row(999) is None


def test_scipy_export_round_trip(ds):
    mat = ds.interaction_matrix()
    sp = mat.scipy(attribute="rating")
    assert sp.shape == (3, 3)
    assert sp.nnz == 6
    u1 = ds.users.number(1)
    i12 = ds.items.number(12)
    assert sp[u1, i12] == pytest.approx(5.0)


def test_torch_export(ds):
    torch = pytest.importorskip("torch")
    mat = ds.interaction_matrix()
    t = mat.torch(attribute="rating")
    assert t.shape == (3, 3)
    assert t.to_dense().sum().item() == pytest.approx(4 + 3 + 5 + 2 + 4 + 1)


def test_co_occurrences(ds):
    co = ds.interactions().co_occurrences()
    # items 10 and 12 co-occur for users 1 and 2 -> count 2
    i10 = ds.items.number(10)
    i12 = ds.items.number(12)
    co_d = co.toarray() if hasattr(co, "toarray") else np.asarray(co)
    assert co_d[i10, i12] == 2
    # 10 and 11 co-occur only for user 1
    i11 = ds.items.number(11)
    assert co_d[i10, i11] == 1


def test_sample_negatives_never_positive():
    # wide catalog so every user has true negatives (the tiny shared fixture
    # has a user who rated the whole catalog — no negative exists there)
    rng = np.random.default_rng(42)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 20, 400),
            "item_id": rng.integers(0, 100, 400),
        }
    ).drop_duplicates()
    wide = from_interactions_df(df)
    mat = wide.interaction_matrix()
    users = np.repeat(np.arange(wide.user_count, dtype=np.int32), 5)
    negs = mat.sample_negatives(users, rng=np.random.default_rng(7))
    for u, i in zip(users, np.ravel(negs)):
        row = mat.row_items(number=int(u))
        assert wide.items.ids[int(i)] not in set(row.ids().tolist())


def test_sample_negatives_popularity_weighting():
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 50, 2000),
            "item_id": rng.choice(200, 2000, p=(1.0 / np.arange(1, 201) ** 1.2) / np.sum(1.0 / np.arange(1, 201) ** 1.2)),
        }
    ).drop_duplicates()
    wide = from_interactions_df(df)
    mat = wide.interaction_matrix()
    users = np.zeros(4000, dtype=np.int32)
    negs = np.ravel(mat.sample_negatives(users, weighting="popularity", verify=False, rng=np.random.default_rng(1)))
    # popularity weighting must draw popular items far more often than uniform
    counts = np.bincount(negs, minlength=wide.item_count)
    top_share = counts[np.argsort(-counts)[:20]].sum() / counts.sum()
    assert top_share > 0.35  # uniform would give ~0.1


def test_row_stats_matrix(ds):
    mat = ds.interaction_matrix()
    rs = mat.row_stats()
    assert rs["count"].sum() == 6
    cs = mat.col_stats()
    assert cs["count"].sum() == 6


def test_interaction_table_formats(ds):
    df = ds.interaction_table(format="pandas")
    assert len(df) == 6
    assert "rating" in df.columns


def test_save_load_preserves_stats(ds, tmp_path):
    from lkpy_tpu.data import Dataset

    ds.save(tmp_path / "d")
    back = Dataset.load(tmp_path / "d")
    pd.testing.assert_frame_equal(
        ds.item_stats().sort_index(), back.item_stats().sort_index(), check_like=True
    )
    assert back.interaction_count == ds.interaction_count


def test_unknown_entity_and_relationship_errors(ds):
    with pytest.raises(KeyError):
        ds.entities("nope")
    with pytest.raises(KeyError):
        ds.relationships("nope")
