"""
FlexMF: flexible embedding-model family (explicit / logistic / BPR / WARP).

Capability parity with the reference FlexMF package
(reference: src/lenskit/flexmf/_base.py:34, _model.py:18, _training.py:39,
_explicit.py:38, _implicit.py:49,141,164,293; losses :399-415): biased MF
models trained by minibatch gradient descent with configurable losses,
negative-sampling strategies (uniform / popularity / misranked), presets
(bpr / warp / lightgcn), and AdamW / L2 / no regularization.

TPU-native: pure JAX pytree model + optax instead of torch nn.Embedding;
negative sampling and the WARP misranked search run *inside* the jitted
train step (bounded candidate budget instead of the reference's host loop,
reference _implicit.py:293-415); LightGCN convolutions run through the
shared graph ops (``lkpy_tpu.ops.graph``).
"""

from __future__ import annotations

from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
import optax
from pydantic import AliasChoices, BaseModel, Field, model_validator

from lkpy_tpu.config import EmbeddingSizeMixin

from lkpy_tpu.data import Dataset, ItemList, QueryInput, RecQuery, Vocabulary
from lkpy_tpu.logging import get_logger
from lkpy_tpu.ops.sampling import DeviceCSRIndex, sample_negatives
from lkpy_tpu.pipeline.components import Component
from lkpy_tpu.random import int_seed
from lkpy_tpu.training import ModelTrainer, TrainingOptions, UsesTrainer

_log = get_logger(__name__)

__all__ = [
    "FlexMFConfigBase",
    "FlexMFExplicitConfig",
    "FlexMFExplicitScorer",
    "FlexMFImplicitConfig",
    "FlexMFImplicitScorer",
    "FlexMFScorerBase",
]

ImplicitLoss = Literal["logistic", "pairwise", "warp"]
NegativeStrategy = Literal["uniform", "popular", "misranked"]

PRESETS = {
    "bpr": {"loss": "pairwise"},
    "warp": {"loss": "warp"},
    "lightgcn": {"loss": "pairwise", "convolution_layers": 2},
}


class FlexMFConfigBase(EmbeddingSizeMixin, BaseModel):
    """Common FlexMF configuration (reference: _base.py:34)."""

    embedding_size: int = Field(default=64, validation_alias=AliasChoices("embedding_size", "features"))
    batch_size: int = 8 * 1024
    learning_rate: float = 0.01
    epochs: int = 10
    regularization: float = 0.01
    reg_method: Literal["AdamW", "L2"] | None = "AdamW"


class FlexMFExplicitConfig(FlexMFConfigBase):
    """Explicit-feedback configuration (reference: _explicit.py:24)."""

    regularization: float = 0.1
    reg_method: Literal["AdamW", "L2"] | None = "L2"


class FlexMFImplicitConfig(FlexMFConfigBase):
    """Implicit-feedback configuration (reference: _implicit.py:49)."""

    preset: Literal["bpr", "warp", "lightgcn"] | None = None
    loss: ImplicitLoss = "logistic"
    negative_strategy: NegativeStrategy | None = None
    negative_count: int = 1
    positive_weight: float = 1.0
    user_bias: bool | None = None
    item_bias: bool = True
    convolution_layers: int = 0
    warp_candidates: int = 64
    "TPU-specific: WARP misrank-search candidate budget per positive (the\n    reference loops up to MAX_TRIES=200 on the host; we batch the search)."

    def selected_negative_strategy(self) -> NegativeStrategy:
        if self.negative_strategy is not None:
            return self.negative_strategy
        return "misranked" if self.loss == "warp" else "uniform"

    @model_validator(mode="before")
    @classmethod
    def apply_preset(cls, data):
        if isinstance(data, dict) and (preset := data.get("preset")):
            if preset not in PRESETS:
                raise ValueError(f"unknown preset {preset!r}")
            return PRESETS[preset] | data
        return data

    @model_validator(mode="after")
    def check_strategies(self):
        if self.loss == "warp" and self.negative_strategy not in (None, "misranked"):
            raise ValueError("WARP loss requires 'misranked' negative strategy")
        if self.selected_negative_strategy() == "misranked" and self.negative_count > 1:
            raise ValueError("misranked negatives only work with single negatives")
        return self


# ---------------------------------------------------------------------------
# model functions (pytree params; reference _model.py:18 FlexMFModel)
def init_params(key, n_users: int, n_items: int, k: int, user_bias: bool, item_bias: bool, scale=0.1):
    ks = jax.random.split(key, 4)
    params = {
        "u_embed": jax.random.normal(ks[0], (n_users, k), dtype=jnp.float32) * scale,
        "i_embed": jax.random.normal(ks[1], (n_items, k), dtype=jnp.float32) * scale,
    }
    if user_bias:
        params["u_bias"] = jax.random.normal(ks[2], (n_users,), dtype=jnp.float32) * scale
    if item_bias:
        params["i_bias"] = jax.random.normal(ks[3], (n_items,), dtype=jnp.float32) * scale
    return params


def model_scores(params, users, items, *, embeds=None):
    """Score user/item pairs.  ``users`` (B,), ``items`` (B,) or (B, N)."""
    u_embed = embeds[0] if embeds is not None else params["u_embed"]
    i_embed = embeds[1] if embeds is not None else params["i_embed"]
    ue = u_embed[users]  # (B, k)
    ie = i_embed[items]  # (B, k) or (B, N, k)
    if ie.ndim == 3:
        score = jnp.einsum("bk,bnk->bn", ue, ie)
    else:
        score = jnp.sum(ue * ie, axis=-1)
    norm = jnp.sum(ue * ue, axis=-1)
    if ie.ndim == 3:
        norm = norm[:, None] + jnp.sum(ie * ie, axis=-1)
    else:
        norm = norm + jnp.sum(ie * ie, axis=-1)
    if "u_bias" in params:
        ub = params["u_bias"][users]
        score = score + (ub[:, None] if ie.ndim == 3 else ub)
        norm = norm + (ub[:, None] ** 2 if ie.ndim == 3 else ub**2)
    if "i_bias" in params:
        ib = params["i_bias"][items]
        score = score + ib
        norm = norm + ib**2
    return score, norm


def lightgcn_propagate(params, conv, layers: int, *, adj=None):
    """LightGCN propagation: mean of K+1 normalized-adjacency convolutions
    (reference: _model.py layers / graphs/lightgcn.py).  Delegates to the
    shared graph ops: the dense bf16 adjacency when provided (the big-graph
    MXU path), edge segment-sums otherwise."""
    from lkpy_tpu.ops.graph import propagate, propagate_dense

    blend = jnp.full(layers + 1, 1.0 / (layers + 1), dtype=jnp.float32)
    if adj is not None:
        return propagate_dense(params["u_embed"], params["i_embed"], adj, blend)
    return propagate(params["u_embed"], params["i_embed"], conv, blend)


# ---------------------------------------------------------------------------
# scorers
class FlexMFScorerBase(UsesTrainer, Component):
    """Base scorer (reference: _base.py:98)."""

    config: FlexMFConfigBase

    users: Vocabulary
    items: Vocabulary
    params: dict

    @property
    def is_trained(self) -> bool:
        return hasattr(self, "params")

    @is_trained.setter
    def is_trained(self, v):
        pass

    def score_offset(self) -> float:
        return 0.0

    def __call__(self, query: QueryInput, items: ItemList) -> ItemList:
        query = RecQuery.create(query)
        user_num = None
        if query.user_id is not None:
            user_num = self.users.number(query.user_id, missing="negative")
        if user_num is None or user_num < 0:
            return ItemList(items, scores=np.full(len(items), np.nan, dtype=np.float32))
        item_nums = items.numbers(vocabulary=self.items, missing="negative")
        mask = item_nums >= 0
        scores = np.full(len(items), np.nan, dtype=np.float32)
        u = self.params["u_embed"][user_num]
        s = self.params["i_embed"][item_nums[mask]] @ u
        if "u_bias" in self.params:
            s = s + self.params["u_bias"][user_num]
        if "i_bias" in self.params:
            s = s + self.params["i_bias"][item_nums[mask]]
        scores[mask] = s + self.score_offset()
        return ItemList(items, scores=scores)

    def get_parameters(self) -> dict[str, object]:
        return {k: np.asarray(v) for k, v in self.params.items()}

    def load_parameters(self, state: dict[str, object]) -> None:
        self.params = {k: np.asarray(v) for k, v in state.items()}


class FlexMFExplicitScorer(FlexMFScorerBase):
    """Biased-MF regression (reference: _explicit.py:38)."""

    config: FlexMFExplicitConfig
    global_bias: float

    def score_offset(self) -> float:
        return self.global_bias

    def create_trainer(self, data, options):
        return FlexMFExplicitTrainer(self, data, options)


class FlexMFImplicitScorer(FlexMFScorerBase):
    """Implicit-feedback scorer with logistic/BPR/WARP losses
    (reference: _implicit.py:141)."""

    config: FlexMFImplicitConfig

    def create_trainer(self, data, options):
        return FlexMFImplicitTrainer(self, data, options)


# ---------------------------------------------------------------------------
# trainers
class FlexMFTrainerBase(ModelTrainer):
    """Batching/optimizer driver (reference: _training.py:39).

    When ``TrainingOptions.mesh`` is set, the embedding tables are
    row-sharded over the mesh's ``model`` axis and each batch is sharded
    over ``data`` — GSPMD inserts the embedding all-gathers and the psum
    gradient reduction (the reference's torch loop is single-device;
    this is the scaling path, SURVEY.md §2.3)."""

    def __init__(self, component: FlexMFScorerBase, data: Dataset, options: TrainingOptions):
        from lkpy_tpu.parallel.gradient import table_rows

        self.component = component
        self.config = component.config
        self.mesh = options.mesh
        self.rng = options.random_generator()
        self.key = jax.random.key(int_seed(options.rng))
        component.users = data.users
        component.items = data.items
        self.n_users = data.user_count
        self.n_items = data.item_count
        self.nu_pad = table_rows(self.n_users, self.mesh)
        self.ni_pad = table_rows(self.n_items, self.mesh)
        self.epochs_trained = 0
        self.prepare_data(data)
        self.key, k = jax.random.split(self.key)
        self.params = self._place(self.init_model(k))
        self.opt = self.make_optimizer()
        self.opt_state = self._place(self.opt.init(self.params))
        from lkpy_tpu.parallel.gradient import jit_sharded_epoch

        self._epoch = jit_sharded_epoch(
            self.build_step(),
            self.mesh,
            self.params,
            self.opt_state,
            self._sharded_rows,
            n_const=len(self.step_consts),
        )

    @property
    def _sharded_rows(self) -> set[int]:
        return {self.nu_pad, self.ni_pad}

    @property
    def step_consts(self) -> tuple:
        """Non-scanned device arrays the step takes after the key (sampling
        indices, graph structure).  These MUST flow as arguments — a
        closed-over device array embeds in the program as a constant, and
        ML-20M-sized index/edge arrays blow the compile payload past the
        compile service's limits (measured: a 168 MB MLIR rejection)."""
        return ()

    def _place(self, tree):
        from lkpy_tpu.parallel.gradient import place_tree

        return place_tree(self.mesh, tree, self._sharded_rows)

    def make_optimizer(self):
        cfg = self.config
        if cfg.reg_method == "AdamW":
            return optax.adamw(cfg.learning_rate, weight_decay=cfg.regularization)
        return optax.adam(cfg.learning_rate)

    @property
    def explicit_norm(self) -> bool:
        return self.config.reg_method == "L2"

    def prepare_data(self, data: Dataset):
        raise NotImplementedError

    def init_model(self, key):
        raise NotImplementedError

    def build_step(self):
        raise NotImplementedError

    def _epoch_perm(self):
        """The epoch's shuffled (and tail-padded) example order — the exact
        RNG call sequence of the round-3 per-batch loop."""
        n = len(self._users)
        perm = self.rng.permutation(n)
        bs = min(self.config.batch_size, n)
        if self.mesh is not None:
            # batch dim must split evenly over the data axis
            d = self.mesh.shape["data"]
            bs = max(d, bs - bs % d)
        tail = n % bs
        if tail:
            perm = np.concatenate([perm, self.rng.choice(n, size=bs - tail)])
        return perm, bs

    def epoch_batches(self):
        """Yield padded (users, items, extra...) batches for one epoch."""
        perm, bs = self._epoch_perm()
        for lo in range(0, len(perm), bs):
            yield perm[lo : lo + bs]

    def train_epoch(self) -> float:
        """One epoch as ONE device program: a ``lax.scan`` over the steps
        (per-step dispatch cost ~88 ms on tunneled backends — ~30× the
        device work; see parallel/gradient.py ``jit_sharded_epoch``)."""
        perm, bs = self._epoch_perm()
        n_steps = len(perm) // bs
        base = None if self.mesh is not None else self.epoch_base_arrays()
        if base is not None:
            # device-resident base arrays + one int32 permutation upload
            # per epoch: the host-gather form shipped every gathered batch
            # array (2-3 × nnz × 4 B ≈ 110-170 MB/epoch over the tunnel at
            # 17-58 MB/s — several seconds of pure upload, the dominant
            # fixed cost of an epoch).  Shuffling stays on the HOST rng so
            # the example order is bit-identical to the per-batch loop.
            if getattr(self, "_base_dev", None) is None:
                self._base_dev = tuple(jnp.asarray(a) for a in base)
            perm_dev = jnp.asarray(perm.astype(np.int32, copy=False))
            stacked = tuple(
                jnp.take(b, perm_dev, axis=0).reshape(n_steps, bs, *b.shape[1:])
                for b in self._base_dev
            )
        else:
            stacked = tuple(
                self._place_epoch(jnp.asarray(a).reshape(n_steps, bs, *a.shape[1:]))
                for a in self.batch_arrays(perm)
            )
        self.params, self.opt_state, self.key, total = self._epoch(
            self.params, self.opt_state, self.key, *self.step_consts, *stacked
        )
        self.epochs_trained += 1
        return float(total) / n_steps if n_steps else 0.0  # ONE readback per epoch

    def _place_epoch(self, arr):
        if self.mesh is None:
            return arr
        from lkpy_tpu.parallel.gradient import epoch_batch_sharding

        return jax.device_put(arr, epoch_batch_sharding(self.mesh))

    def batch_arrays(self, idx):
        raise NotImplementedError

    def epoch_base_arrays(self) -> tuple | None:
        """The host arrays ``batch_arrays`` gathers from, such that
        ``batch_arrays(idx) == tuple(a[idx] for a in base)`` — lets
        :meth:`train_epoch` keep them device-resident and gather on device
        (one permutation upload per epoch instead of every batch array).
        Return None if the trainer's batches are not a pure row gather."""
        return None

    def _table_size(self, name: str) -> int:
        return self.n_users if name.startswith("u_") else self.n_items

    def _trim(self, params: dict) -> dict:
        """Strip mesh-padding rows back to the real user/item counts."""
        return {k: np.asarray(v)[: self._table_size(k)] for k, v in params.items()}

    def finalize(self):
        self.component.params = self._trim(self.final_params())

    def final_params(self):
        return self.params

    def get_parameters(self):
        return self._trim(self.params)

    def load_parameters(self, state):
        params = {}
        for k, v in state.items():
            v = np.asarray(v)
            rows = self.nu_pad if k.startswith("u_") else self.ni_pad
            if v.shape[0] < rows:
                v = np.concatenate([v, np.zeros((rows - v.shape[0],) + v.shape[1:], v.dtype)])
            params[k] = jnp.asarray(v)
        self.params = self._place(params)
        self.opt_state = self._place(self.opt.init(self.params))


class FlexMFExplicitTrainer(FlexMFTrainerBase):

    def prepare_data(self, data: Dataset):
        csr = data.interaction_matrix().csr("rating")
        if csr.values is None:
            raise ValueError("explicit FlexMF requires ratings")
        coo = csr.to_coo()
        mean = float(np.mean(coo.values))
        self.component.global_bias = mean
        self._users = coo.row.astype(np.int32)
        self._items = coo.col.astype(np.int32)
        self._ratings = (coo.values - mean).astype(np.float32)

    def init_model(self, key):
        return init_params(key, self.nu_pad, self.ni_pad, self.config.embedding_size, True, True)

    def batch_arrays(self, idx):
        return (
            jnp.asarray(self._users[idx]),
            jnp.asarray(self._items[idx]),
            jnp.asarray(self._ratings[idx]),
        )

    def epoch_base_arrays(self):
        return (self._users, self._items, self._ratings)

    def build_step(self):
        reg = self.config.regularization
        use_norm = self.explicit_norm
        opt = self.opt

        def loss_fn(params, users, items, ratings):
            pred, norm = model_scores(params, users, items)
            loss = jnp.mean((pred - ratings) ** 2)
            if use_norm:
                loss = loss + reg * jnp.mean(norm)
            return loss

        def step(params, opt_state, key, users, items, ratings):
            loss, grads = jax.value_and_grad(loss_fn)(params, users, items, ratings)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step


class FlexMFImplicitTrainer(FlexMFTrainerBase):
    def prepare_data(self, data: Dataset):
        csr = data.interaction_matrix().csr(None)
        coo = csr.to_coo()
        self._users = coo.row.astype(np.int32)
        self._items = coo.col.astype(np.int32)
        self.neg_index = DeviceCSRIndex.from_csr(csr)
        self.conv = None
        self._adj = None
        if getattr(self.config, "convolution_layers", 0):
            from lkpy_tpu.ops.graph import (
                build_dense_adjacency,
                dense_adjacency_eligible,
                sorted_conv,
            )

            deg_u = np.maximum(np.diff(csr.rowptr), 1).astype(np.float32)
            deg_i = np.maximum(np.bincount(coo.col, minlength=self.n_items), 1).astype(np.float32)
            vals = (1.0 / np.sqrt(deg_u[coo.row] * deg_i[coo.col])).astype(np.float32)
            # segment counts use the mesh-padded table sizes so the
            # propagated embeddings keep the (padded) table shape; the same
            # big-graph discipline as LightGCN applies (sorted edge copies,
            # dense bf16 adjacency on the MXU where it fits — a full-graph
            # propagate in the scanned step otherwise scatter-sorts every
            # edge per step and breaks the compiler at ML-20M scale)
            self.conv = sorted_conv(coo.row, coo.col, vals, self.nu_pad, self.ni_pad)
            if dense_adjacency_eligible(len(coo.row), self.nu_pad, self.ni_pad):
                self._adj = build_dense_adjacency(
                    self.conv[0], self.conv[1], self.conv[2], self.nu_pad, self.ni_pad
                )
            elif len(coo.row) >= 4_000_000:
                _log.warning(
                    "FlexMF convolution on a large sparse graph without the "
                    "dense-adjacency budget — training may be slow or fail to "
                    "compile; consider LightGCNScorer or a smaller graph",
                    edges=len(coo.row),
                )

    def init_model(self, key):
        cfg = self.config
        user_bias = cfg.user_bias
        if user_bias is None:
            user_bias = cfg.loss == "logistic"
        return init_params(
            key, self.nu_pad, self.ni_pad, cfg.embedding_size, user_bias, cfg.item_bias
        )

    def batch_arrays(self, idx):
        return (jnp.asarray(self._users[idx]), jnp.asarray(self._items[idx]))

    def epoch_base_arrays(self):
        return (self._users, self._items)

    def final_params(self):
        if self.conv is not None:
            u_eff, i_eff = lightgcn_propagate(
                self.params, self.conv, self.config.convolution_layers, adj=self._adj
            )
            out = dict(self.params)
            out["u_embed"] = u_eff
            out["i_embed"] = i_eff
            return out
        return self.params

    @property
    def step_consts(self) -> tuple:
        out = (self.neg_index.rowptr, self.neg_index.colind, self.neg_index.bloom)
        if self._adj is not None:
            out = out + (self._adj,)
        elif self.conv is not None:
            out = out + (
                self.conv[0],
                self.conv[1],
                self.conv[2],
                self.conv[5],
                self.conv[6],
                self.conv[7],
            )
        return out

    def build_step(self):
        cfg = self.config
        reg = cfg.regularization
        use_norm = self.explicit_norm
        opt = self.opt
        loss_kind = cfg.loss
        n_neg = cfg.negative_count
        pos_w = cfg.positive_weight
        strategy = cfg.selected_negative_strategy()
        has_conv = self.conv is not None
        has_adj = self._adj is not None
        nu_pad, ni_pad = self.nu_pad, self.ni_pad
        idx_rows, idx_cols = self.neg_index.n_rows, self.neg_index.n_cols
        log2_bits = self.neg_index.log2_bits
        layers = getattr(cfg, "convolution_layers", 0)
        n_items = self.n_items
        C = cfg.warp_candidates

        def scores(params, conv, adj, users, items):
            if adj is not None or conv is not None:
                embeds = lightgcn_propagate(params, conv, layers, adj=adj)
            else:
                embeds = None
            return model_scores(params, users, items, embeds=embeds)

        def loss_fn(params, key, neg_index, conv, adj, users, pos):
            pos_pred, pos_norm = scores(params, conv, adj, users, pos)

            if strategy == "misranked":
                # WARP (reference: _implicit.py:293): sample a candidate
                # budget, find the first misranked negative; estimated rank
                # from the attempt count -> harmonic weight.
                negs = sample_negatives(key, neg_index, users, n=C, weighting="uniform")
                cand_scores, cand_norms = scores(params, conv, adj, users, negs)
                better = cand_scores > pos_pred[:, None]  # (B, C)
                any_better = jnp.any(better, axis=1)
                first = jnp.argmax(better, axis=1)  # first misrank position
                best = jnp.argmax(cand_scores, axis=1)  # fallback: best effort
                chosen = jnp.where(any_better, first, best)
                tries = jnp.where(any_better, chosen + 1, C).astype(jnp.float32)
                b_idx = jnp.arange(users.shape[0])
                neg_pred = cand_scores[b_idx, chosen]
                neg_norm = cand_norms[b_idx, chosen]
                ranks = (n_items - 1) / tries
                weights = (
                    jnp.log(ranks)
                    + np.euler_gamma
                    + 1 / (2 * ranks)
                    - 1 / (12 * ranks**2)
                    + 1 / (120 * ranks**4)
                )
                lp = -jax.nn.log_sigmoid(pos_pred - neg_pred) * jax.lax.stop_gradient(weights)
                loss = jnp.mean(lp)
            else:
                negs = sample_negatives(key, neg_index, users, n=n_neg, weighting="popularity" if strategy == "popular" else "uniform")
                neg_pred, neg_norm = scores(params, conv, adj, users, negs)
                if loss_kind == "logistic":
                    pos_lp = -jax.nn.log_sigmoid(pos_pred) * pos_w
                    neg_lp = -jax.nn.log_sigmoid(-neg_pred)
                    loss = (jnp.sum(pos_lp) + jnp.sum(neg_lp)) / (pos_lp.size + neg_lp.size)
                else:  # pairwise / BPR
                    lp = -jax.nn.log_sigmoid(pos_pred[:, None] - neg_pred)
                    loss = jnp.mean(lp)
            if use_norm:
                loss = loss + reg * 0.5 * (jnp.mean(pos_norm) + jnp.mean(neg_norm))
            return loss

        def step(params, opt_state, key, *args):
            # consts first (see step_consts), then the scanned batch
            nrp, nci, bloom = args[0], args[1], args[2]
            neg_index = DeviceCSRIndex(nrp, nci, idx_rows, idx_cols, bloom, log2_bits)
            conv = adj = None
            if has_adj:
                adj = args[3]
                users, pos = args[4], args[5]
            elif has_conv:
                conv = (args[3], args[4], args[5], nu_pad, ni_pad, args[6], args[7], args[8])
                users, pos = args[9], args[10]
            else:
                users, pos = args[3], args[4]
            loss, grads = jax.value_and_grad(loss_fn)(params, key, neg_index, conv, adj, users, pos)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step
