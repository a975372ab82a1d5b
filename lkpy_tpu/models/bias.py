"""
User-item bias model.

Capability parity with the reference bias model
(reference: src/lenskit/basic/bias.py:35 ``BiasModel``; ``learn`` :84;
``BiasScorer`` :299).  Model: b_ui = b_g + b_i + b_u with Bayesian damping
(counts + β in the denominator), item biases computed on global-centered
ratings and user biases on item-centered residuals.

TPU-native: the learning pass is a jitted segment-reduction program
(:mod:`lkpy_tpu.ops.segment`) over COO interaction arrays instead of the
reference's ``np.add.at`` host loops.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel

from lkpy_tpu.data import Dataset, ItemList, QueryInput, RecQuery, Vocabulary
from lkpy_tpu.ops.segment import segment_count, segment_mean, segment_sum
from lkpy_tpu.pipeline.components import Component
from lkpy_tpu.training import TrainingOptions

__all__ = ["BiasModel", "BiasConfig", "BiasScorer", "entity_damping"]

Damping = "float | dict[str, float] | tuple[float, float]"


def entity_damping(damping, entity: str) -> float:
    """Per-entity damping lookup (reference: bias.py ``entity_damping``)."""
    if isinstance(damping, dict):
        return float(damping.get(entity, 0.0))
    if isinstance(damping, (tuple, list)):
        return float(damping[0] if entity == "user" else damping[1])
    return float(damping)


@partial(
    jax.jit,
    static_argnames=("n_users", "n_items", "user_damping", "item_damping", "with_items"),
)
def _learn_biases(
    unums,
    inums,
    ratings,
    *,
    n_users: int,
    n_items: int,
    user_damping: float,
    item_damping: float,
    with_items: bool = True,
):
    """Jitted bias fit: global mean → damped item means → damped user means.

    ``with_items=False`` skips the item pass entirely — matching the
    reference's ``entities={'user'}`` semantics (bias.py ``learn``), where
    user biases are residuals against the global mean ONLY, not against
    item-centered ratings."""
    g = jnp.mean(ratings)
    centered = ratings - g
    if with_items:
        i_bias = segment_mean(centered, inums, n_items, damping=item_damping)
        centered = centered - i_bias[inums]
    else:
        i_bias = jnp.zeros(n_items, dtype=ratings.dtype)
    u_bias = segment_mean(centered, unums, n_users, damping=user_damping)
    return g, i_bias, u_bias


@dataclass
class BiasModel:
    """Learned bias parameters (reference: bias.py:35)."""

    damping: float | dict | tuple
    global_bias: float
    items: Vocabulary | None = None
    item_biases: np.ndarray | None = None
    users: Vocabulary | None = None
    user_biases: np.ndarray | None = None

    @classmethod
    def learn(cls, data: Dataset, damping=0.0, *, entities=frozenset({"user", "item"})) -> "BiasModel":
        matrix = data.interaction_matrix()
        csr = matrix.csr("rating")
        if csr.values is None:
            raise ValueError("bias model requires rating values")
        coo = csr.to_coo()
        g, i_bias, u_bias = _learn_biases(
            jnp.asarray(coo.row),
            jnp.asarray(coo.col),
            jnp.asarray(coo.values),
            n_users=csr.nrows,
            n_items=csr.ncols,
            user_damping=entity_damping(damping, "user"),
            item_damping=entity_damping(damping, "item"),
            with_items="item" in entities,
        )
        model = cls(damping, float(g))
        if "item" in entities:
            model.items = matrix.col_vocabulary
            model.item_biases = np.asarray(i_bias, dtype=np.float32)
        if "user" in entities:
            model.users = matrix.row_vocabulary
            model.user_biases = np.asarray(u_bias, dtype=np.float32)
        return model

    def transform_matrix(self, csr):
        """Subtract biases from CSR rating values
        (reference: bias.py ``transform_matrix``): r' = r − b_g − b_i − b_u."""
        from lkpy_tpu.data.matrix import CSR

        vals = csr.values.astype(np.float64) - self.global_bias
        coo = csr.to_coo()
        if self.item_biases is not None:
            vals = vals - self.item_biases[coo.col]
        if self.user_biases is not None:
            vals = vals - self.user_biases[coo.row]
        return CSR(csr.rowptr, csr.colind, vals.astype(np.float32), csr.shape, csr.fields)

    def compute_for_items(
        self,
        items: ItemList,
        user_id=None,
        user_items: ItemList | None = None,
        *,
        bias: float | None = None,
    ):
        """Composite bias scores for items + a user (reference: bias.py:166).

        Unknown users/items have zero bias."""
        n = len(items)
        scores = np.full(n, self.global_bias, dtype=np.float32)
        if self.item_biases is not None and self.items is not None:
            nums = items.numbers(vocabulary=self.items, missing="negative")
            ok = nums >= 0
            scores[ok] += self.item_biases[nums[ok]]

        if bias is not None:
            return scores + np.float32(bias)

        user_bias = 0.0
        ratings = user_items.field("rating") if user_items is not None else None
        if ratings is not None and len(user_items) > 0:
            # fold-in: damped mean residual of the user's ratings; item
            # biases subtract only when the model HAS them (a users-only
            # model folds residuals against the global mean alone —
            # reference bias.py compute_for_items; round-5 review found the
            # old `item_biases is not None` gate dropped fold-in entirely
            # for entities={'user'} models)
            resid = ratings.astype(np.float64) - self.global_bias
            if self.item_biases is not None and self.items is not None:
                nums = user_items.numbers(vocabulary=self.items, missing="negative")
                ok = nums >= 0
                resid[ok] -= self.item_biases[nums[ok]]
            ud = entity_damping(self.damping, "user")
            user_bias = float(np.sum(resid) / (len(resid) + ud))
        elif user_id is not None and self.user_biases is not None and self.users is not None:
            un = self.users.number(user_id, missing="negative")
            if un >= 0:
                user_bias = float(self.user_biases[un])
        return scores + np.float32(user_bias), user_bias


class BiasConfig(BaseModel):
    """Configuration for :class:`BiasScorer` (reference: bias.py ``BiasConfig``)."""

    damping: float | dict[str, float] | tuple[float, float] = 0.0
    entities: set[Literal["user", "item"]] = {"user", "item"}

    def entity_damping(self, entity: str) -> float:
        return entity_damping(self.damping, entity)


class BiasScorer(Component):
    """Bias-based rating prediction (reference: bias.py:299)."""

    config: BiasConfig
    model: BiasModel

    @property
    def is_trained(self) -> bool:
        return hasattr(self, "model")

    @is_trained.setter
    def is_trained(self, value: bool):
        pass

    def train(self, data: Dataset, options: TrainingOptions | None = None):
        options = options or TrainingOptions()
        if not options.retrain and self.is_trained:
            return
        self.model = BiasModel.learn(data, self.config.damping, entities=self.config.entities)

    def __call__(self, query: QueryInput, items: ItemList) -> ItemList:
        query = RecQuery.create(query)
        scores, _bias = self.model.compute_for_items(items, query.user_id, query.user_items)
        return ItemList(items, scores=scores)
