"""
Stochastic ranking.

Capability parity with the reference ``StochasticTopNRanker``
(reference: src/lenskit/stochastic/_ranker.py:59): sample items without
replacement with probability proportional to softmax(score).

TPU-native: uses the Gumbel-top-k trick — adding Gumbel noise to logits and
taking top-k is equivalent to sequential softmax sampling without
replacement, and is a single vectorized ``top_k`` instead of a sampling loop.
"""

from __future__ import annotations

import numpy as np
from pydantic import BaseModel

from lkpy_tpu.data import ItemList, QueryInput, RecQuery
from lkpy_tpu.pipeline.components import Component
from lkpy_tpu.random import RNGInput, derive_seed, random_generator

__all__ = ["StochasticTopNRanker", "StochasticTopNConfig", "stochastic_rank"]


def stochastic_rank(items: ItemList, n: int | None, seed, *, scale: float = 1.0) -> ItemList:
    """Gumbel-top-k softmax sampling of an item list."""
    scores = items.scores()
    if scores is None:
        raise ValueError("stochastic ranking requires scores")
    valid = ~np.isnan(scores)
    k = int(valid.sum())
    if n is not None and n >= 0:
        k = min(k, n)
    rng = random_generator(seed)
    gumbel = rng.gumbel(size=len(scores))
    keys = np.where(valid, scores * scale + gumbel, -np.inf)
    order = np.argsort(-keys, kind="stable")[:k]
    out = items[order]
    return ItemList(out, ordered=True, rank=np.arange(1, k + 1, dtype=np.int32), scores=scores[order])


class StochasticTopNConfig(BaseModel):
    """Configuration (reference: stochastic/_ranker.py config)."""

    n: int = -1
    rng: int | None = None
    scale: float = 1.0
    "Multiplier applied to scores before softmax (inverse temperature)."


class StochasticTopNRanker(Component):
    """Softmax-weighted stochastic top-N ranker (reference: _ranker.py:59)."""

    config: StochasticTopNConfig

    def __call__(self, items: ItemList, query: QueryInput = None, n: int | None = None) -> ItemList:
        if n is None or n < 0:
            n = self.config.n
        query = RecQuery.create(query)
        seed = derive_seed("StochasticTopNRanker", query.user_id, base=self.config.rng)
        return stochastic_rank(items, n, seed, scale=self.config.scale)
