"""
SLIM: Sparse LInear Methods (Ning & Karypis 2011).

Capability parity with the reference ``SLIMScorer``
(reference: src/lenskit/knn/slim.py:53; Rust CD at src/accel/slim/mod.rs:58).
Trained with batched FISTA on device (:mod:`lkpy_tpu.ops.slim`).
"""

from __future__ import annotations

import numpy as np
from pydantic import BaseModel

from lkpy_tpu.data import Dataset, ItemList, QueryInput, RecQuery, Vocabulary
from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.logging import Stopwatch, get_logger, item_progress
from lkpy_tpu.ops.slim import train_slim
from lkpy_tpu.pipeline.components import Component
from lkpy_tpu.training import TrainingOptions

_log = get_logger(__name__)

__all__ = ["SLIMConfig", "SLIMScorer"]


class SLIMConfig(BaseModel):
    """Hyperparameters (reference: slim.py:30)."""

    l1_reg: float = 1.0
    l2_reg: float = 1.0
    max_iters: int = 100
    max_nbrs: int | None = None


class SLIMScorer(Component):
    """SLIM item scorer (reference: slim.py:53).

    ``weights`` is the transposed weight matrix: w[i, j] is the weight of
    predictor item i for target item j (reference: slim.py:84)."""

    config: SLIMConfig

    items: Vocabulary
    weights: CSR

    @property
    def is_trained(self) -> bool:
        return hasattr(self, "weights")

    @is_trained.setter
    def is_trained(self, v):
        pass

    def train(self, data: Dataset, options: TrainingOptions | None = None):
        options = options or TrainingOptions()
        if not options.retrain and self.is_trained:
            return
        sw = Stopwatch()
        ui = data.interaction_matrix().csr(None)
        ui = ui.with_values(np.ones(ui.nnz, dtype=np.float32))
        with item_progress("SLIM columns", data.item_count) as pb:
            self.weights = train_slim(
                ui, self.config.l1_reg, self.config.l2_reg, self.config.max_iters, progress=pb
            )
        self.items = data.items
        _log.info("trained SLIM", time=str(sw), nnz=self.weights.nnz)

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
        # score(j) = sum over predictor items i in history of w[i, j]
        w = self.weights.to_scipy()
        all_scores = np.asarray(w[r_good, :].sum(axis=0)).ravel()
        t_nums = items.numbers(vocabulary=self.items, missing="negative")
        t_mask = t_nums >= 0
        scores[t_mask] = all_scores[t_nums[t_mask]]
        return ItemList(items, scores=scores)
