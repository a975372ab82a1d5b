"""
Temporal (global-time) splitting
(reference: src/lenskit/splitting/_temporal.py:20,124).
"""

from __future__ import annotations

from datetime import datetime
from typing import Sequence

import numpy as np

from lkpy_tpu.data import Dataset
from lkpy_tpu.splitting.split import TTSplit, split_dataset_by_mask

__all__ = ["split_global_time", "split_temporal_fraction"]


def _as_ts(t) -> float:
    if isinstance(t, datetime):
        return t.timestamp()
    return float(t)


def split_global_time(data: Dataset, time, end=None) -> TTSplit | list[TTSplit]:
    """
    Split at global time point(s): test = interactions in [time, end)
    (reference: _temporal.py:20).  A list of times yields a list of splits.
    """
    if isinstance(time, (list, tuple)):
        points = [_as_ts(t) for t in time] + [None if end is None else _as_ts(end)]
        return [
            _time_split(data, points[i], points[i + 1])
            for i in range(len(points) - 1)
        ]
    return _time_split(data, _as_ts(time), None if end is None else _as_ts(end))


def _time_split(data: Dataset, start: float, end: float | None) -> TTSplit:
    tbl = data.interactions().pandas()
    if "timestamp" not in tbl.columns:
        raise ValueError("dataset has no timestamps")
    ts = tbl["timestamp"].to_numpy().astype(np.float64)
    mask = ts >= start
    if end is not None:
        mask &= ts < end
        # train excludes interactions after the window too
        train_mask = ts < start
        test_mask = mask
        return _bounded_split(data, train_mask, test_mask)
    return split_dataset_by_mask(data, mask)


def _bounded_split(data: Dataset, train_mask: np.ndarray, test_mask: np.ndarray) -> TTSplit:
    from lkpy_tpu.splitting.split import dataset_from_rows
    import pandas as pd

    from lkpy_tpu.data import ItemList, ItemListCollection
    from lkpy_tpu.data.schema import num_col_name

    tbl = data.interactions().pandas()
    test_rows = tbl[test_mask]
    ilc = ItemListCollection(["user_id"])
    for unum, grp in test_rows.groupby(num_col_name("user"), sort=True):
        fields = {
            c: grp[c].to_numpy()
            for c in grp.columns
            if c not in (num_col_name("user"), num_col_name("item"))
        }
        il = ItemList(item_nums=grp[num_col_name("item")].to_numpy(), vocabulary=data.items, **fields)
        ilc.add(il, data.users.id(int(unum)))
    train = dataset_from_rows(data, train_mask)
    return TTSplit(train, ilc)


def split_temporal_fraction(data: Dataset, test_fraction: float) -> TTSplit:
    """Hold out the most recent fraction of interactions
    (reference: _temporal.py:124)."""
    tbl = data.interactions().pandas()
    ts = tbl["timestamp"].to_numpy().astype(np.float64)
    cut = np.quantile(ts, 1.0 - test_fraction)
    return split_global_time(data, cut)
