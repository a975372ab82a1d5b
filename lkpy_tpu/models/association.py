"""
Association-rule item scoring.

Capability parity with the reference ``AssociationScorer``
(reference: src/lenskit/knn/association.py:59): item relatedness by
conditional probability P[i|j], lift, or damped ("biased") lift from
co-occurrence counts; scoring by mean or max over the query's reference
items.
"""

from __future__ import annotations

from typing import Literal

import numpy as np
import scipy.sparse as sps
from pydantic import BaseModel

from lkpy_tpu.data import Dataset, ItemList, QueryInput, RecQuery, Vocabulary
from lkpy_tpu.logging import Stopwatch, get_logger
from lkpy_tpu.pipeline.components import Component
from lkpy_tpu.training import TrainingOptions

_log = get_logger(__name__)

__all__ = ["AssociationConfig", "AssociationScorer"]


class AssociationConfig(BaseModel):
    """Configuration (reference: association.py:30)."""

    method: Literal["probability", "lift"] = "probability"
    damping: float = 0.0
    max_nbrs: int | None = None


class AssociationScorer(Component):
    """Association-rule scorer (reference: association.py:59)."""

    config: AssociationConfig

    items: Vocabulary
    item_freqs: np.ndarray
    assoc_scores: sps.csr_array

    @property
    def is_trained(self) -> bool:
        return hasattr(self, "assoc_scores")

    @is_trained.setter
    def is_trained(self, v):
        pass

    def train(self, data: Dataset, options: TrainingOptions | None = None):
        options = options or TrainingOptions()
        if not options.retrain and self.is_trained:
            return
        sw = Stopwatch()
        matrix = data.interaction_matrix()
        n_groups = matrix.n_rows
        ui = matrix.scipy(None).astype(np.float32)
        ui.data[:] = 1.0
        cooc = (ui.T @ ui).tocoo()
        # zero the diagonal (self co-occurrence)
        keep = cooc.row != cooc.col
        rows, cols, vals = cooc.row[keep], cooc.col[keep], cooc.data[keep].astype(np.float64)

        item_counts = np.asarray(ui.sum(axis=0)).ravel()
        vals = vals / (item_counts[rows] + self.config.damping)
        if self.config.method == "lift":
            vals = vals * n_groups / (item_counts[cols] + self.config.damping)
        self.items = data.items
        self.item_freqs = item_counts.astype(np.int32)
        self.assoc_scores = sps.csr_array(
            (vals.astype(np.float32), (rows, cols)), shape=(data.item_count, data.item_count)
        )
        _log.info("trained association rules", time=str(sw), pairs=self.assoc_scores.nnz)

    def __call__(self, query: QueryInput, items: ItemList) -> ItemList:
        query = RecQuery.create(query)
        scores = np.full(len(items), np.nan, dtype=np.float32)
        refs = query.user_items
        if refs is None or len(refs) == 0:
            return ItemList(items, scores=scores)
        r_nums = refs.numbers(vocabulary=self.items, missing="negative")
        r_good = r_nums[r_nums >= 0]
        if len(r_good) == 0:
            return ItemList(items, scores=scores)

        mat = np.asarray(self.assoc_scores[r_good, :].todense())
        if self.config.max_nbrs == 1:
            all_scores = mat.max(axis=0)
        elif self.config.max_nbrs is None:
            all_scores = mat.mean(axis=0)
        else:
            # top max_nbrs reference items per target
            k = min(self.config.max_nbrs, mat.shape[0])
            part = np.partition(mat, -k, axis=0)[-k:]
            all_scores = part.mean(axis=0)

        t_nums = items.numbers(vocabulary=self.items, missing="negative")
        t_mask = t_nums >= 0
        scores[t_mask] = all_scores[t_nums[t_mask]]
        return ItemList(items, scores=scores)
