"""
Non-negative matrix factorization scorer.

Capability parity with the reference ``NMFScorer``
(reference: src/lenskit/sklearn/nmf.py:51 — sklearn NMF bridge).
TPU-native: Lee–Seung multiplicative updates on device (dense MXU matmuls
under jit) for the Frobenius objective, zero-filled like sklearn's sparse
handling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import AliasChoices, BaseModel, Field

from lkpy_tpu.data import Dataset, ItemList, QueryInput, RecQuery, Vocabulary
from lkpy_tpu.logging import get_logger
from lkpy_tpu.pipeline.components import Component
from lkpy_tpu.training import TrainingOptions

_log = get_logger(__name__)

__all__ = ["NMFConfig", "NMFScorer"]

_EPS = 1e-9


class NMFConfig(BaseModel):
    """Configuration (reference: sklearn/nmf.py:33)."""

    features: int = Field(default=50, validation_alias=AliasChoices("features", "embedding_size"))
    max_iter: int = 200


@partial(jax.jit, static_argnames=("iters",))
def _nmf_mu(a, w0, h0, iters: int):
    """Multiplicative updates for min ||A − WH||_F, W,H >= 0."""

    def body(_, wh):
        w, h = wh
        # H update
        num = jnp.dot(w.T, a, preferred_element_type=jnp.float32)
        den = jnp.dot(jnp.dot(w.T, w, preferred_element_type=jnp.float32), h, preferred_element_type=jnp.float32)
        h = h * num / (den + _EPS)
        # W update
        num = jnp.dot(a, h.T, preferred_element_type=jnp.float32)
        den = jnp.dot(w, jnp.dot(h, h.T, preferred_element_type=jnp.float32), preferred_element_type=jnp.float32)
        w = w * num / (den + _EPS)
        return w, h

    return jax.lax.fori_loop(0, iters, body, (w0, h0))


class NMFScorer(Component):
    """NMF scorer (reference: sklearn/nmf.py:51)."""

    config: NMFConfig

    users: Vocabulary
    items: Vocabulary
    user_components: np.ndarray  # (n_users, k)
    item_components: np.ndarray  # (k, n_items)

    @property
    def is_trained(self) -> bool:
        return hasattr(self, "item_components")

    @is_trained.setter
    def is_trained(self, v):
        pass

    def train(self, data: Dataset, options: TrainingOptions | None = None):
        options = options or TrainingOptions()
        if not options.retrain and self.is_trained:
            return
        csr = data.interaction_matrix().csr("rating")
        dense = np.asarray(csr.to_scipy(structural=csr.values is None).todense(), dtype=np.float32)
        k = min(self.config.features, min(dense.shape))
        rng = options.random_generator()
        # NNDSVD-lite init: scaled uniform (sklearn 'random' init scaling)
        scale = np.sqrt(dense.mean() / k)
        w0 = jnp.asarray(np.abs(rng.standard_normal((dense.shape[0], k))).astype(np.float32) * scale)
        h0 = jnp.asarray(np.abs(rng.standard_normal((k, dense.shape[1]))).astype(np.float32) * scale)
        w, h = _nmf_mu(jnp.asarray(dense), w0, h0, self.config.max_iter)
        self.user_components = np.asarray(w)
        self.item_components = np.asarray(h)
        self.users = data.users
        self.items = data.items
        _log.info("trained NMF", features=k)

    def __call__(self, query: QueryInput, items: ItemList) -> ItemList:
        query = RecQuery.create(query)
        user_num = None
        if query.user_id is not None:
            user_num = self.users.number(query.user_id, missing="negative")
        scores = np.full(len(items), np.nan, dtype=np.float32)
        if user_num is None or user_num < 0:
            return ItemList(items, scores=scores)
        item_nums = items.numbers(vocabulary=self.items, missing="negative")
        mask = item_nums >= 0
        scores[mask] = self.user_components[user_num] @ self.item_components[:, item_nums[mask]]
        return ItemList(items, scores=scores)
