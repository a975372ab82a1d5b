"""
User-based splitting (reference: src/lenskit/splitting/_users.py:27,85).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from lkpy_tpu.data import Dataset, ItemListCollection
from lkpy_tpu.data.schema import num_col_name
from lkpy_tpu.random import RNGInput, random_generator
from lkpy_tpu.splitting.holdout import HoldoutMethod
from lkpy_tpu.splitting.split import TTSplit, dataset_from_rows

__all__ = ["crossfold_users", "sample_users"]


def _user_split(data: Dataset, user_nums: np.ndarray, method: HoldoutMethod, name=None) -> TTSplit:
    """Hold out items for the given users; everything else trains."""
    matrix = data.interaction_matrix()
    tbl = data.interactions().pandas()
    n = len(tbl)
    # map (row order in CSR) == table order from MatrixRelationshipSet; but the
    # *relationship table* order may differ, so work with explicit pair keys.
    test_mask = np.zeros(n, dtype=bool)
    ilc = ItemListCollection(["user_id"])
    ucol = tbl[num_col_name("user")].to_numpy()
    icol = tbl[num_col_name("item")].to_numpy()
    # sort table rows by user once; per-user ranges via searchsorted
    order = np.argsort(ucol, kind="stable")
    sorted_u = ucol[order]
    for unum in user_nums:
        row = matrix.row_items(number=int(unum))
        test_items = method(row)
        ilc.add(test_items, data.users.id(int(unum)))
        lo = np.searchsorted(sorted_u, unum, side="left")
        hi = np.searchsorted(sorted_u, unum, side="right")
        sel = order[lo:hi]
        tmask = np.isin(icol[sel], test_items.numbers())
        test_mask[sel[tmask]] = True
    train = dataset_from_rows(data, ~test_mask)
    return TTSplit(train, ilc, name)


def sample_users(
    data: Dataset,
    size: int,
    method: HoldoutMethod,
    *,
    rng: RNGInput = None,
    test_only: bool = False,
) -> TTSplit:
    """Sample ``size`` users and hold out items per ``method``
    (reference: _users.py:85)."""
    gen = random_generator(rng)
    n_users = data.user_count
    size = min(size, n_users)
    users = gen.choice(n_users, size=size, replace=False)
    return _user_split(data, np.sort(users), method)


def crossfold_users(
    data: Dataset,
    partitions: int,
    method: HoldoutMethod,
    *,
    rng: RNGInput = None,
) -> Iterator[TTSplit]:
    """Partition users into k folds; each fold's users get held-out items
    (reference: _users.py:27)."""
    gen = random_generator(rng)
    users = gen.permutation(data.user_count)
    for i, fold in enumerate(np.array_split(users, partitions)):
        yield _user_split(data, np.sort(fold), method, name=f"fold-{i}")
