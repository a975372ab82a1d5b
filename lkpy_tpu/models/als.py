"""
Alternating least squares matrix factorization.

Capability parity with the reference ALS package
(reference: src/lenskit/als/_common.py:36,113,195; _explicit.py:32,94;
_implicit.py:35,133): ``BiasedMFScorer`` (explicit, bias-normalized) and
``ImplicitMFScorer`` (Hu et al. confidence weighting), with fold-in user
embeddings and the ``user_embeddings: bool|"prefer"`` behavior
(reference: _common.py:56).

TPU-native: half-epochs run through the batched-Cholesky bucket kernels in
:mod:`lkpy_tpu.ops.als` instead of rayon row loops; factor tables are device
arrays; multi-chip sharding lives in :mod:`lkpy_tpu.parallel.als`.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import AliasChoices, BaseModel, Field

from lkpy_tpu.config import EmbeddingSizeMixin

from lkpy_tpu.data import Dataset, ItemList, QueryInput, RecQuery, Vocabulary
from lkpy_tpu.logging import get_logger
from lkpy_tpu.models.bias import BiasModel
from lkpy_tpu.ops import als as als_ops
from lkpy_tpu.ops.sparse import bucket_rows
from lkpy_tpu.pipeline.components import Component
from lkpy_tpu.training import ModelTrainer, TrainingOptions, UsesTrainer

_log = get_logger(__name__)

__all__ = [
    "ALSConfig",
    "ALSBase",
    "BiasedMFConfig",
    "BiasedMFScorer",
    "ImplicitMFConfig",
    "ImplicitMFScorer",
    "UIPair",
]


class UIPair(BaseModel):
    """Separate user/item values (reference: _common.py ``UIPair``)."""

    user: float
    item: float


# ---------------------------------------------------------------------------
# fold-in kernels for the grouped serving engine (batch/serving.py).
#
# Module-level (stable identity) so the serving programs that close over them
# hit the jit cache across calls; every non-array parameter arrives as a
# device-resident scalar to avoid per-call uploads.


def _fold_implicit_kernel(cols, vals, mask, i_emb, OtOr, weight):
    """Vectorized implicit fold-in (reference: als/_implicit.py:133)."""
    m = mask.astype(jnp.float32)
    conf = (weight * m) if vals is None else (vals * weight * m)
    u = als_ops.solve_implicit_bucket(cols, conf, mask, i_emb, OtOr)
    return u, jnp.zeros(cols.shape[0], dtype=jnp.float32)


def _fold_explicit_kernel(cols, vals, mask, i_emb, i_bias, gbias, damping, reg):
    """Vectorized explicit fold-in with bias removal
    (reference: als/_explicit.py:94 + _train_bias_row_cholesky:121)."""
    m = mask.astype(jnp.float32)
    resid = (vals - gbias - i_bias[cols]) * m
    n_u = jnp.sum(m, axis=1)
    ub = jnp.sum(resid, axis=1) / (n_u + damping)
    resid = (resid - ub[:, None]) * m
    u = als_ops.solve_explicit_bucket(cols, resid, mask, i_emb, reg)
    return u, ub


class ALSConfig(EmbeddingSizeMixin, BaseModel):
    """ALS configuration (reference: als/_common.py:36)."""

    embedding_size: int = Field(default=64, validation_alias=AliasChoices("embedding_size", "features"))
    epochs: int = 10
    regularization: float | UIPair = 0.1
    user_embeddings: bool | Literal["prefer"] = True

    @property
    def user_reg(self) -> float:
        if isinstance(self.regularization, UIPair):
            return self.regularization.user
        return self.regularization

    @property
    def item_reg(self) -> float:
        if isinstance(self.regularization, UIPair):
            return self.regularization.item
        return self.regularization


class ALSBase(UsesTrainer, Component):
    """Base ALS scorer (reference: als/_common.py:113; scoring :133-173)."""

    config: ALSConfig

    users: Vocabulary | None
    items: Vocabulary
    user_embeddings: np.ndarray | None
    item_embeddings: np.ndarray

    @property
    def is_trained(self) -> bool:
        return hasattr(self, "item_embeddings")

    @is_trained.setter
    def is_trained(self, v):
        pass

    def __call__(self, query: QueryInput, items: ItemList) -> ItemList:
        query = RecQuery.create(query)
        user_num = None
        if query.user_id is not None and self.users is not None:
            user_num = self.users.number(query.user_id, missing="negative")
            if user_num < 0:
                user_num = None

        u_offset = None
        u_feat = None
        if (
            query.user_items is not None
            and len(query.user_items) > 0
            and self.config.user_embeddings != "prefer"
        ):
            u_feat, u_offset = self.new_user_embedding(user_num, query.user_items)

        if u_feat is None:
            if user_num is None or self.user_embeddings is None:
                return ItemList(items, scores=np.full(len(items), np.nan, dtype=np.float32))
            u_feat = self.user_embeddings[user_num, :]

        item_nums = items.numbers(vocabulary=self.items, missing="negative")
        mask = item_nums >= 0
        scores = np.full(len(items), np.nan, dtype=np.float32)
        scores[mask] = self.item_embeddings[item_nums[mask], :] @ u_feat
        return self.finalize_scores(user_num, ItemList(items, scores=scores), u_offset)

    def new_user_embedding(self, user_num, items: ItemList) -> tuple[np.ndarray | None, float | None]:
        raise NotImplementedError

    def finalize_scores(self, user_num, items: ItemList, user_bias: float | None) -> ItemList:
        return items

    def device_fold_in(self, cols, vals, mask):
        """
        Batched fold-in user embeddings for device batch scoring
        (the vectorized form of ``new_user_embedding``).

        Args:
            cols: (B, H) int32 padded history item numbers.
            vals: (B, H) f32 ratings (may be None for implicit data).
            mask: (B, H) bool validity.

        Returns:
            (user embeddings (B, k), per-user bias offsets (B,)).
        """
        kern, args = self.device_fold_kernel()
        return kern(cols, vals, mask, *args)

    def device_fold_kernel(self):
        """``(kernel_fn, device_args)`` for the grouped serving engine
        (batch/serving.py): ``kernel_fn`` is a pure, module-level jnp
        function called inside the serving program's scan body."""
        raise NotImplementedError

    # ---- parameter container (reference: state/_container.py:14) ---------
    def get_parameters(self) -> dict[str, object]:
        return {
            "user_embeddings": self.user_embeddings,
            "item_embeddings": self.item_embeddings,
        }

    def load_parameters(self, state: dict[str, object]) -> None:
        self.user_embeddings = state["user_embeddings"]  # type: ignore[assignment]
        self.item_embeddings = state["item_embeddings"]  # type: ignore[assignment]


class ALSTrainerBase(ModelTrainer):
    """Half-epoch ALS driver (reference: als/_common.py:195, train_epoch :241)."""

    mode = "explicit"

    def __init__(self, scorer: ALSBase, data: Dataset, options: TrainingOptions):
        self.scorer = scorer
        self.config = scorer.config
        scorer.users = data.users
        scorer.items = data.items
        self.rng = options.random_generator()
        self.epochs_trained = 0
        self.mesh = options.mesh

        ui_csr = self.prepare_matrix(data)
        iu_csr = ui_csr.transpose()
        # bucket + chunk rows once; shapes stay static across epochs so each
        # bucket-width scan body compiles exactly once.  With a mesh, chunk
        # batches shard over the 'data' axis (the TPU form of the reference's
        # rayon row parallelism, src/accel/als/explicit.rs:62).
        # width ladder: every padded slot costs a factor-row gather (the
        # epoch bottleneck, ~3.5 ns/row); finer ladders lift occupancy but
        # compile/load more programs — the measured trade-off table and the
        # cold-start escape hatch live on TrainingPerfSettings.ladder_ratio
        from lkpy_tpu.config import lkpy_tpu_config

        ratio = lkpy_tpu_config().training_perf.ladder_ratio
        self.u_buckets = als_ops.chunk_buckets(bucket_rows(ui_csr, field="rating", ratio=ratio), mesh=self.mesh)
        self.i_buckets = als_ops.chunk_buckets(bucket_rows(iu_csr, field="rating", ratio=ratio), mesh=self.mesh)

        k = self.config.embedding_size
        self.u_factors = self._place(self.initial_params(ui_csr.nrows, k))
        self.i_factors = self._place(self.initial_params(ui_csr.ncols, k))
        if jax.default_backend() == "tpu":
            # serialized compile+load priming — on remote TPU backends the
            # async first-epoch path pays minutes otherwise (see ops/als.py)
            als_ops.warm_epoch_programs(
                self.u_buckets, self.i_buckets, ui_csr.nrows, ui_csr.ncols, k, self.mode, mesh=self.mesh
            )

    def _place(self, arr):
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            return jax.device_put(jnp.asarray(arr), NamedSharding(self.mesh, PartitionSpec()))
        return jnp.asarray(arr)

    # subclass API ---------------------------------------------------------
    def prepare_matrix(self, data: Dataset):
        raise NotImplementedError

    def initial_params(self, nrows: int, ncols: int) -> np.ndarray:
        raise NotImplementedError

    # epoch loop -----------------------------------------------------------
    def train_epoch(self):
        # one fused device program per epoch: both halves, no host sync —
        # the returned delta is a DEVICE scalar so the host can enqueue the
        # next epoch while this one runs; float() it only when a convergence
        # check actually needs the value
        self.u_factors, self.i_factors, du, di = als_ops.als_epoch(
            self.u_buckets,
            self.i_buckets,
            self.u_factors,
            self.i_factors,
            self.config.user_reg,
            self.config.item_reg,
            mode=self.mode,
            mesh=self.mesh,
        )
        self.epochs_trained += 1
        self.last_delta = du + di
        return self.last_delta

    def _half_epoch(self, side: str) -> float:
        if side == "user":
            self.u_factors, delta = als_ops.als_half_epoch(
                self.u_buckets, self.u_factors, self.i_factors, self.config.user_reg, mode=self.mode, mesh=self.mesh
            )
        else:
            self.i_factors, delta = als_ops.als_half_epoch(
                self.i_buckets, self.i_factors, self.u_factors, self.config.item_reg, mode=self.mode, mesh=self.mesh
            )
        return delta

    def finalize(self):
        self.scorer.item_embeddings = np.asarray(self.u_to_host(self.i_factors))
        if self.config.user_embeddings:
            self.scorer.user_embeddings = np.asarray(self.u_to_host(self.u_factors))
        else:
            self.scorer.user_embeddings = None

    @staticmethod
    def u_to_host(arr) -> np.ndarray:
        return np.asarray(arr, dtype=np.float32)

    def get_parameters(self) -> dict[str, object]:
        return {"user_factors": np.asarray(self.u_factors), "item_factors": np.asarray(self.i_factors)}

    def load_parameters(self, state: dict[str, object]) -> None:
        self.u_factors = jnp.asarray(state["user_factors"])
        self.i_factors = jnp.asarray(state["item_factors"])


# ---------------------------------------------------------------------------
# explicit
class BiasedMFConfig(ALSConfig):
    damping: float | dict[str, float] = 5.0


class BiasedMFScorer(ALSBase):
    """Explicit-feedback biased MF (reference: als/_explicit.py:32)."""

    config: BiasedMFConfig
    bias: BiasModel

    def create_trainer(self, data, options):
        return BiasedMFTrainer(self, data, options)

    def new_user_embedding(self, user_num, items: ItemList):
        ratings = items.field("rating")
        if ratings is None:
            return None, None
        inums = items.numbers(vocabulary=self.items, missing="negative")
        mask = (inums >= 0) & np.isfinite(ratings)
        biases, u_bias = self.bias.compute_for_items(items, None, items)
        resid = (ratings - biases)[mask]
        u_feat = als_ops.solve_row_explicit(inums[mask], resid, self.item_embeddings, self.config.user_reg)
        return u_feat, u_bias

    def finalize_scores(self, user_num, items: ItemList, user_bias: float | None) -> ItemList:
        scores = items.scores()
        if user_bias is None:
            if user_num is not None and self.bias.user_biases is not None:
                user_bias = float(self.bias.user_biases[user_num])
            else:
                user_bias = 0.0
        biases = self.bias.compute_for_items(items, bias=user_bias)
        return ItemList(items, scores=scores + biases)

    def device_fold_in(self, cols, vals, mask):
        if vals is None:
            raise ValueError("explicit ALS fold-in requires ratings")
        return super().device_fold_in(cols, vals, mask)

    def device_fold_kernel(self):
        from lkpy_tpu.batch.device import _cached_device
        from lkpy_tpu.batch.serving import scalar_dev
        from lkpy_tpu.models.bias import entity_damping

        return _fold_explicit_kernel, (
            _cached_device(self.item_embeddings),
            _cached_device(self.bias.item_biases),
            scalar_dev(self.bias.global_bias),
            scalar_dev(entity_damping(self.bias.damping, "user")),
            scalar_dev(self.config.user_reg),
        )


class BiasedMFTrainer(ALSTrainerBase):
    mode = "explicit"

    def prepare_matrix(self, data: Dataset):
        matrix = data.interaction_matrix()
        csr = matrix.csr("rating")
        if csr.values is None:
            raise ValueError("explicit ALS requires rating values")
        self.scorer.bias = BiasModel.learn(data, damping=self.config.damping)
        return self.scorer.bias.transform_matrix(csr)

    def initial_params(self, nrows: int, ncols: int) -> np.ndarray:
        mat = self.rng.standard_normal((nrows, ncols)).astype(np.float32)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        return mat


# ---------------------------------------------------------------------------
# implicit
class ImplicitMFConfig(ALSConfig):
    weight: float = 40.0
    use_ratings: bool = False


class ImplicitMFScorer(ALSBase):
    """Implicit-feedback MF, Hu et al. (reference: als/_implicit.py:35)."""

    config: ImplicitMFConfig
    _OtOr: np.ndarray

    @property
    def fold_in_needs_ratings(self) -> bool:
        """Batch fold-in only needs rating values when confidences use them —
        lets the device batch path skip shipping them (batch/device.py)."""
        return self.config.use_ratings

    def create_trainer(self, data, options):
        return ImplicitMFTrainer(self, data, options)

    def new_user_embedding(self, user_num, user_items: ItemList):
        inums = user_items.numbers(vocabulary=self.items, missing="negative")
        good = inums >= 0
        if self.config.use_ratings:
            ratings = user_items.field("rating")
            if ratings is None:
                raise ValueError("no ratings in user items")
            conf = ratings[good] * self.config.weight
        else:
            conf = np.full(int(np.sum(good)), self.config.weight)
        u_feat = als_ops.solve_row_implicit(
            inums[good], conf.astype(np.float32), self.item_embeddings, self._OtOr
        )
        return u_feat, None

    def device_fold_in(self, cols, vals, mask):
        if self.config.use_ratings and vals is None:
            raise ValueError("use_ratings=True requires rating values")
        if not self.config.use_ratings:
            vals = None  # flat confidence ignores any supplied ratings
        return super().device_fold_in(cols, vals, mask)

    def device_fold_kernel(self):
        from lkpy_tpu.batch.device import _cached_device
        from lkpy_tpu.batch.serving import scalar_dev

        return _fold_implicit_kernel, (
            _cached_device(self.item_embeddings),
            _cached_device(self._OtOr),
            scalar_dev(self.config.weight),
        )


class ImplicitMFTrainer(ALSTrainerBase):
    mode = "implicit"

    def prepare_matrix(self, data: Dataset):
        matrix = data.interaction_matrix()
        if self.config.use_ratings:
            csr = matrix.csr("rating")
            if csr.values is None:
                raise ValueError("use_ratings=True but no ratings present")
        else:
            csr = matrix.csr(None)
            csr = csr.with_values(np.ones(csr.nnz, dtype=np.float32))
        return csr.with_values(csr.values * self.config.weight)

    def initial_params(self, nrows: int, ncols: int) -> np.ndarray:
        mat = self.rng.standard_normal((nrows, ncols)).astype(np.float32) * 0.01
        return mat * mat

    def finalize(self):
        # OtOr is only needed for fold-in scoring, so it is computed here
        # (and NOT per-epoch: that forced a device→host sync every epoch)
        super().finalize()
        self.scorer._OtOr = np.asarray(
            als_ops.implicit_otor(self.i_factors, jnp.float32(self.config.user_reg))
        )
