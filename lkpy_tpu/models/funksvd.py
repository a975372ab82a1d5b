"""
FunkSVD explicit-feedback matrix factorization.

Capability parity with the reference ``FunkSVDScorer``
(reference: src/lenskit/funksvd.py:80,111; Rust src/accel/funksvd.rs:39):
featurewise SGD over bias residuals with trailing-value estimation and
range clamping.  Trains with minibatch SGD per feature
(:mod:`lkpy_tpu.ops.funksvd`) — documented deviation from exact-order
sequential SGD.

Single-device by design: the reference kernel is single-threaded
sequential SGD (funksvd.rs runs one pass over the rating triples in
order), so there is no parallel semantics to distribute — the mesh-scaled
gradient path for this model family is FlexMF
(:mod:`lkpy_tpu.models.flexmf`), which honors ``TrainingOptions.mesh``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from pydantic import AliasChoices, BaseModel, Field

from lkpy_tpu.config import EmbeddingSizeMixin

from lkpy_tpu.data import Dataset, ItemList, QueryInput, RecQuery, Vocabulary
from lkpy_tpu.logging import Stopwatch, get_logger, item_progress
from lkpy_tpu.models.bias import BiasModel
from lkpy_tpu.ops.funksvd import train_feature
from lkpy_tpu.pipeline.components import Component
from lkpy_tpu.training import TrainingOptions

_log = get_logger(__name__)

__all__ = ["FunkSVDConfig", "FunkSVDScorer"]

INITIAL_VALUE = 0.1


class FunkSVDConfig(EmbeddingSizeMixin, BaseModel):
    """Configuration (reference: funksvd.py:34)."""

    embedding_size: int = Field(default=64, validation_alias=AliasChoices("embedding_size", "features"))
    epochs: int = 100
    learning_rate: float = 0.001
    regularization: float = 0.015
    damping: float | dict[str, float] = 5.0
    range: tuple[float, float] | None = None
    batch_size: int = 8192
    "TPU-specific: minibatch size for the featurewise SGD kernel."


class FunkSVDScorer(Component):
    """FunkSVD scorer (reference: funksvd.py:80)."""

    config: FunkSVDConfig

    bias: BiasModel
    users: Vocabulary
    items: Vocabulary
    user_embeddings: np.ndarray
    item_embeddings: np.ndarray

    @property
    def is_trained(self) -> bool:
        return hasattr(self, "item_embeddings")

    @is_trained.setter
    def is_trained(self, v):
        pass

    def train(self, data: Dataset, options: TrainingOptions | None = None):
        options = options or TrainingOptions()
        if not options.retrain and self.is_trained:
            return
        sw = Stopwatch()
        csr = data.interaction_matrix().csr("rating")
        if csr.values is None:
            raise ValueError("FunkSVD requires rating values")
        coo = csr.to_coo()
        n_users, n_items = csr.shape
        n = csr.nnz

        self.bias = BiasModel.learn(data, damping=self.config.damping)

        rng = options.random_generator()
        shuf = rng.permutation(n)
        users = coo.row[shuf].astype(np.int32)
        items = coo.col[shuf].astype(np.int32)
        ratings = coo.values[shuf].astype(np.float32)

        est = np.full(n, self.bias.global_bias, dtype=np.float32)
        est += self.bias.item_biases[items]
        est += self.bias.user_biases[users]

        if self.config.range is not None:
            rmin, rmax = self.config.range
        else:
            rmin, rmax = -np.inf, np.inf

        batch = min(self.config.batch_size, n)
        pad = (-n) % batch
        users_p = np.concatenate([users, np.zeros(pad, dtype=np.int32)])
        items_p = np.concatenate([items, np.zeros(pad, dtype=np.int32)])
        ratings_p = np.concatenate([ratings, np.zeros(pad, dtype=np.float32)])
        mask_p = np.concatenate([np.ones(n, dtype=np.float32), np.zeros(pad, dtype=np.float32)])

        esize = self.config.embedding_size
        uemb = np.full((n_users, esize), INITIAL_VALUE, dtype=np.float32)
        iemb = np.full((n_items, esize), INITIAL_VALUE, dtype=np.float32)

        ju, ji, jr, jm = map(jnp.asarray, (users_p, items_p, ratings_p, mask_p))
        with item_progress("FunkSVD dimensions", esize) as pb:
            for f in range(esize):
                trail = jnp.float32(INITIAL_VALUE * INITIAL_VALUE * (esize - f - 1))
                est_p = jnp.asarray(np.concatenate([est, np.zeros(pad, dtype=np.float32)]))
                u_col, i_col, rmse = train_feature(
                    ju, ji, jr, jm, est_p,
                    jnp.asarray(uemb[:, f]), jnp.asarray(iemb[:, f]), trail,
                    self.config.learning_rate, self.config.regularization,
                    rmin, rmax, n_users, n_items, self.config.epochs, batch,
                )
                uemb[:, f] = np.asarray(u_col)
                iemb[:, f] = np.asarray(i_col)
                est = np.clip(est + uemb[users, f] * iemb[items, f], rmin, rmax)
                pb.update()
        _log.info("trained FunkSVD", time=str(sw), features=esize, rmse=float(rmse))

        self.users = data.users
        self.items = data.items
        self.user_embeddings = uemb
        self.item_embeddings = iemb

    def __call__(self, query: QueryInput, items: ItemList) -> ItemList:
        query = RecQuery.create(query)
        user_num = None
        if query.user_id is not None:
            user_num = self.users.number(query.user_id, missing="negative")
        if user_num is None or user_num < 0:
            return ItemList(items, scores=np.full(len(items), np.nan, dtype=np.float32))
        u_feat = self.user_embeddings[user_num, :]
        item_nums = items.numbers(vocabulary=self.items, missing="negative")
        mask = item_nums >= 0
        scores = np.full(len(items), np.nan, dtype=np.float32)
        scores[mask] = self.item_embeddings[item_nums[mask], :] @ u_feat
        biases, _ = self.bias.compute_for_items(items, query.user_id, query.user_items)
        return ItemList(items, scores=scores + biases)
