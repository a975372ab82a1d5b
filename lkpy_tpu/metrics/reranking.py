"""
Reranking comparison metrics
(reference: src/lenskit/metrics/reranking/_rbo.py, _lip.py).
"""

from __future__ import annotations

import numpy as np

from lkpy_tpu.data import ItemList

__all__ = ["rank_biased_overlap", "least_item_promoted"]


def rank_biased_overlap(list1: ItemList, list2: ItemList, p: float = 0.9, *, k: int | None = None) -> float:
    """
    Rank-biased overlap between two rankings (Webber et al. 2010;
    reference: metrics/reranking/_rbo.py).  Truncated estimate at depth k.
    """
    a = list1.ids()
    b = list2.ids()
    if k is None:
        k = min(len(a), len(b))
    if k == 0:
        return np.nan
    seen_a: set = set()
    seen_b: set = set()
    overlap = 0
    rbo = 0.0
    for d in range(1, k + 1):
        ia = a[d - 1] if d <= len(a) else None
        ib = b[d - 1] if d <= len(b) else None
        if ia is not None and ib is not None and ia == ib:
            overlap += 1
        else:
            if ia is not None and ia in seen_b:
                overlap += 1
            if ib is not None and ib in seen_a:
                overlap += 1
        if ia is not None:
            seen_a.add(ia)
        if ib is not None:
            seen_b.add(ib)
        rbo += (overlap / d) * (p ** (d - 1))
    return (1 - p) * rbo


def least_item_promoted(original: ItemList, reranked: ItemList, *, n: int | None = None) -> float:
    """
    The deepest original rank pulled into the reranked top-n
    (reference: metrics/reranking/_lip.py): max original rank among reranked
    items, normalized ideas vary — here we return the raw deepest rank.
    """
    if n is not None:
        reranked = reranked[:n] if len(reranked) > n else reranked
    orig_ids = original.ids()
    pos = {k: i + 1 for i, k in enumerate(orig_ids.tolist())}
    ranks = [pos.get(i) for i in reranked.ids().tolist()]
    ranks = [r for r in ranks if r is not None]
    if not ranks:
        return np.nan
    return float(max(ranks))
