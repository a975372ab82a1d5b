"""
Nearest-neighbor collaborative filtering.

Capability parity with the reference kNN scorers
(reference: src/lenskit/knn/item.py:87 ``ItemKNNScorer`` and
src/lenskit/knn/user.py:76 ``UserKNNScorer``), with matching
min_sim/save_nbrs/min_nbrs/max_nbrs semantics (reference: knn/item.py:41-74).

TPU-native: similarity built by tiled MXU matmul + streaming top-k
(:func:`lkpy_tpu.ops.knn.similarity_topk`); scoring by static-shape gather +
masked top-k kernels instead of per-item heaps.
"""

from __future__ import annotations

from typing import Literal

import jax.numpy as jnp
import numpy as np
from pydantic import AliasChoices, BaseModel, Field, field_validator

from lkpy_tpu.data import Dataset, ItemList, QueryInput, RecQuery, Vocabulary
from lkpy_tpu.logging import Stopwatch, get_logger
from lkpy_tpu.ops import knn as knn_ops
from lkpy_tpu.ops.sparse import bucket_rows
from lkpy_tpu.pipeline.components import Component
from lkpy_tpu.training import TrainingOptions

_log = get_logger(__name__)

__all__ = ["ItemKNNConfig", "ItemKNNScorer", "UserKNNConfig", "UserKNNScorer"]

FeedbackType = Literal["explicit", "implicit"]


class ItemKNNConfig(BaseModel):
    """Configuration (reference: knn/item.py:40)."""

    max_nbrs: int = Field(20, validation_alias=AliasChoices("max_nbrs", "nnbrs", "k"))
    min_nbrs: int = 1
    min_sim: float = 1.0e-6
    save_nbrs: int | None = None
    feedback: FeedbackType = "explicit"
    nbr_table_cap: int = 512
    """TPU-specific: padded-width cap for the stored neighbor table when
    ``save_nbrs`` is None (the reference keeps ragged unbounded rows;
    a static-shape table needs a cap)."""

    @field_validator("min_sim", mode="after")
    @staticmethod
    def clamp_min_sim(sim) -> float:
        return max(sim, float(np.finfo(np.float32).smallest_normal))

    @property
    def explicit(self) -> bool:
        return self.feedback == "explicit"


class ItemKNNScorer(Component):
    """Item-item kNN (reference: knn/item.py:87; train :121, call :236)."""

    config: ItemKNNConfig

    items: Vocabulary
    item_means: np.ndarray | None
    item_counts: np.ndarray
    sim_table: knn_ops.NeighborTable

    @property
    def is_trained(self) -> bool:
        return hasattr(self, "sim_table")

    @is_trained.setter
    def is_trained(self, v):
        pass

    def train(self, data: Dataset, options: TrainingOptions | None = None):
        options = options or TrainingOptions()
        if not options.retrain and self.is_trained:
            return
        log = _log.bind(n_items=data.item_count, feedback=self.config.feedback)
        sw = Stopwatch()
        matrix = data.interaction_matrix()
        ui = matrix.csr("rating" if self.config.explicit else None)
        iu = ui.transpose()
        if iu.values is None:
            iu = iu.with_values(np.ones(iu.nnz, dtype=np.float32))
        normed, means = knn_ops.normalize_item_matrix(iu, explicit=self.config.explicit)
        log.debug("normalized item vectors", time=str(sw))
        k = self.config.save_nbrs or self.config.nbr_table_cap
        if options.mesh is not None:
            from lkpy_tpu.parallel.knn import sharded_similarity_topk

            self.sim_table = sharded_similarity_topk(normed, k, self.config.min_sim, mesh=options.mesh)
        else:
            # ui hands the large-catalog Gram path the user-major structure
            # so chunks derive fully on device (zero per-chunk transfer)
            self.sim_table = knn_ops.similarity_topk(normed, k, self.config.min_sim, user_major=ui)
        self.items = data.items
        self.item_means = means
        self.item_counts = self.sim_table.counts()
        log.info(
            "trained item-item similarity",
            time=str(sw),
            pairs=int(self.item_counts.sum()),
            items_with_nbrs=int((self.item_counts > 0).sum()),
        )

    def __call__(self, query: QueryInput, items: ItemList) -> ItemList:
        query = RecQuery.create(query)
        ratings = query.user_items
        if ratings is None or len(ratings) == 0:
            return ItemList(items, scores=np.full(len(items), np.nan, dtype=np.float32))

        ri_nums = ratings.numbers(vocabulary=self.items, missing="negative")
        ri_mask = ri_nums >= 0
        ti_nums = items.numbers(vocabulary=self.items, missing="negative")
        ti_mask = ti_nums >= 0

        scores = np.full(len(items), np.nan, dtype=np.float32)
        counts = np.zeros(len(items), dtype=np.int32)
        if self.config.explicit:
            ri_vals = ratings.field("rating")
            if ri_vals is None:
                raise RuntimeError("explicit-feedback scorer requires rated history")
            ok = ri_mask & np.isfinite(ri_vals)
            s, c = knn_ops.score_items_explicit(
                self.sim_table,
                ti_nums[ti_mask],
                ri_nums[ok],
                ri_vals[ok],
                self.item_means,
                self.config.max_nbrs,
                self.config.min_nbrs,
            )
        else:
            s, c = knn_ops.score_items_implicit(
                self.sim_table,
                ti_nums[ti_mask],
                ri_nums[ri_mask],
                self.config.max_nbrs,
                self.config.min_nbrs,
            )
        scores[ti_mask] = s
        counts[ti_mask] = c
        return ItemList(items, scores=scores, nbr_counts=counts)


class UserKNNConfig(BaseModel):
    """Configuration (reference: knn/user.py:41)."""

    max_nbrs: int = Field(20, validation_alias=AliasChoices("max_nbrs", "nnbrs", "k"))
    min_nbrs: int = 1
    min_sim: float = 1.0e-6
    feedback: FeedbackType = "explicit"

    @field_validator("min_sim", mode="after")
    @staticmethod
    def clamp_min_sim(sim) -> float:
        return max(sim, float(np.finfo(np.float32).smallest_normal))

    @property
    def explicit(self) -> bool:
        return self.feedback == "explicit"


class UserKNNScorer(Component):
    """User-user kNN (reference: knn/user.py:76).

    TPU-native: query-to-user similarity is one sparse matvec (segment-sum);
    per-item neighbor selection runs over popularity-bucketed padded item
    rows (static shapes, masked top-k)."""

    config: UserKNNConfig

    users: Vocabulary
    items: Vocabulary
    user_means: np.ndarray | None

    @property
    def is_trained(self) -> bool:
        return hasattr(self, "_nv_rows")

    @is_trained.setter
    def is_trained(self, v):
        pass

    def train(self, data: Dataset, options: TrainingOptions | None = None):
        options = options or TrainingOptions()
        if not options.retrain and self.is_trained:
            return
        matrix = data.interaction_matrix()
        ui = matrix.csr("rating" if self.config.explicit else None)
        if ui.values is None:
            ui = ui.with_values(np.ones(ui.nnz, dtype=np.float32))
        self.users = data.users
        self.items = data.items

        lens = ui.row_lengths()
        rows = np.repeat(np.arange(ui.nrows), lens)
        vals = ui.values.astype(np.float64)
        if self.config.explicit:
            sums = np.zeros(ui.nrows)
            np.add.at(sums, rows, vals)
            means = np.zeros(ui.nrows, dtype=np.float32)
            np.divide(sums, lens, out=means, where=lens > 0)
            self.user_means = means
            centered = vals - means[rows]
        else:
            self.user_means = None
            centered = vals
        norms = np.zeros(ui.nrows)
        np.add.at(norms, rows, centered * centered)
        norms = np.maximum(np.sqrt(norms), np.finfo(np.float32).smallest_normal)
        normed = (centered / norms[rows]).astype(np.float32)

        # normalized user-vector COO for the similarity matvec
        self._nv_rows = jnp.asarray(rows.astype(np.int32))
        self._nv_cols = jnp.asarray(ui.colind)
        self._nv_vals = jnp.asarray(normed)
        # centered (unnormalized) item-major buckets for scoring
        iu = ui.with_values(centered.astype(np.float32)).transpose()
        self._iu_buckets = bucket_rows(iu, field="rating")
        self._n_items = iu.nrows

    def __call__(self, query: QueryInput, items: ItemList) -> ItemList:
        query = RecQuery.create(query)
        udata = self._get_user_vector(query)
        if udata is None:
            return ItemList(items, scores=np.full(len(items), np.nan, dtype=np.float32))
        uvec, umean, unum = udata

        sims = np.array(
            knn_ops.sparse_matvec(
                self._nv_rows, self._nv_cols, self._nv_vals, jnp.asarray(uvec), n_rows=len(self.users)
            )
        )
        if unum is not None and unum >= 0:
            sims[unum] = 0.0
        sims[sims < self.config.min_sim] = 0.0

        all_scores = np.full(self._n_items, np.nan, dtype=np.float32)
        all_counts = np.zeros(self._n_items, dtype=np.int32)
        sims_j = jnp.asarray(sims)
        for b in self._iu_buckets:
            s, c = knn_ops.score_users_bucket(
                b.cols,
                b.values,
                b.mask,
                sims_j,
                self.config.max_nbrs,
                self.config.min_nbrs,
                self.config.explicit,
            )
            rows = np.asarray(b.rows)
            all_scores[rows] = np.asarray(s)
            all_counts[rows] = np.asarray(c)
        if self.config.explicit:
            all_scores = all_scores + umean

        ti_nums = items.numbers(vocabulary=self.items, missing="negative")
        ti_mask = ti_nums >= 0
        scores = np.full(len(items), np.nan, dtype=np.float32)
        counts = np.zeros(len(items), dtype=np.int32)
        scores[ti_mask] = all_scores[ti_nums[ti_mask]]
        counts[ti_mask] = all_counts[ti_nums[ti_mask]]
        return ItemList(items, scores=scores, nbr_counts=counts)

    def _get_user_vector(self, query: RecQuery):
        """Build the query user's normalized dense vector
        (reference: user.py:257 ``_get_user_data``)."""
        ratings = query.user_items
        unum = None
        if query.user_id is not None:
            unum = self.users.number(query.user_id, missing="negative")
        if ratings is None or len(ratings) == 0 or (self.config.explicit and ratings.field("rating") is None):
            return None
        nums = ratings.numbers(vocabulary=self.items, missing="negative")
        mask = nums >= 0
        if not mask.any():
            return None
        vec = np.zeros(self._n_items, dtype=np.float32)
        if self.config.explicit:
            vals = ratings.field("rating").astype(np.float64)
            umean = float(vals[mask].mean())
            vec[nums[mask]] = vals[mask] - umean
        else:
            umean = 0.0
            vec[nums[mask]] = 1.0
        norm = np.linalg.norm(vec)
        vec /= max(norm, float(np.finfo(np.float32).smallest_normal))
        return vec, umean, unum
