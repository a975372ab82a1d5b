"""
Repeated-interaction combining (VERDICT r2 #9; reference analog:
MatrixRelationshipSet repeat handling, data/_relationships.py:410 — the
matrix view of a repeating relationship combines duplicates).
"""

import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import DatasetBuilder


@pytest.fixture()
def repeat_ds():
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "item_id": [10, 10, 11, 10],
            "rating": [2.0, 4.0, 5.0, 3.0],
            "timestamp": [100, 200, 150, 50],
        }
    )
    b = DatasetBuilder()
    b.add_interactions("click", df, missing="insert", allow_repeats=True)
    return b.build()


def test_default_combine_mean_rating_last_timestamp(repeat_ds):
    mat = repeat_ds.interaction_matrix()
    csr = mat.csr("rating")
    u1 = repeat_ds.users.number(1)
    i10 = repeat_ds.items.number(10)
    # default: ratings combine by mean
    row = csr.row_cols(u1)
    vals = csr.row_values(u1)
    got = dict(zip(row.tolist(), vals.tolist()))
    assert got[i10] == pytest.approx(3.0)  # mean(2, 4)
    # timestamps combine by last
    ts = mat.csr("timestamp")
    tvals = dict(zip(ts.row_cols(u1).tolist(), ts.row_values(u1).tolist()))
    assert tvals[i10] == pytest.approx(200.0)


def test_combine_sum(repeat_ds):
    mat = repeat_ds.interactions().matrix(combine="sum")
    csr = mat.csr("rating")
    u1 = repeat_ds.users.number(1)
    i10 = repeat_ds.items.number(10)
    vals = dict(zip(csr.row_cols(u1).tolist(), csr.row_values(u1).tolist()))
    assert vals[i10] == pytest.approx(6.0)


def test_combine_first(repeat_ds):
    mat = repeat_ds.interactions().matrix(combine="first")
    csr = mat.csr("rating")
    u1 = repeat_ds.users.number(1)
    i10 = repeat_ds.items.number(10)
    vals = dict(zip(csr.row_cols(u1).tolist(), csr.row_values(u1).tolist()))
    assert vals[i10] == pytest.approx(2.0)


def test_structure_deduplicated(repeat_ds):
    mat = repeat_ds.interaction_matrix()
    csr = mat.csr(None)
    # 3 unique (user, item) pairs from 4 records
    assert csr.nnz == 3
    # but the relationship itself keeps all 4
    assert repeat_ds.interaction_count == 4
