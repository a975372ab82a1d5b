"""
LightGCN graph recommender (He et al. 2020).

Capability parity with the reference ``LightGCNScorer``
(reference: src/lenskit/graphs/lightgcn.py:42,108,186,312,319), which wraps
``torch_geometric.nn.LightGCN``.  TPU-native: propagation is a symmetric-
normalized bipartite SpMM as COO segment-sums (no PyG), with BPR or logistic
loss and negative sampling inside the jitted train step — sharing the FlexMF
embedding machinery (the reference's ``FlexMFModel`` likewise unifies
MF + LightGCN layers, flexmf/_model.py:18).
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
import optax
from pydantic import AliasChoices, BaseModel, Field, model_validator

from lkpy_tpu.config import EmbeddingSizeMixin

from lkpy_tpu.data import Dataset, ItemList, QueryInput, RecQuery, Vocabulary
from lkpy_tpu.logging import get_logger
from lkpy_tpu.models.flexmf import init_params
from lkpy_tpu.ops.sampling import DeviceCSRIndex, sample_negatives
from lkpy_tpu.pipeline.components import Component
from lkpy_tpu.random import int_seed
from lkpy_tpu.training import ModelTrainer, TrainingOptions, UsesTrainer

_log = get_logger(__name__)

__all__ = ["LightGCNConfig", "LightGCNScorer"]


class LightGCNConfig(EmbeddingSizeMixin, BaseModel):
    """Configuration (reference: graphs/lightgcn.py:42)."""

    embedding_size: int = Field(default=16, validation_alias=AliasChoices("embedding_size", "features"))
    layer_count: int = 2
    layer_blend: float | list[float] | None = None
    batch_size: int = 4 * 1024
    learning_rate: float = 0.01
    epochs: int = 10
    regularization: float | None = 0.01
    loss: Literal["logistic", "pairwise"] = "pairwise"

    @model_validator(mode="after")
    def check_layer_blending(self):
        if isinstance(self.layer_blend, list) and len(self.layer_blend) != self.layer_count:
            raise ValueError("layer_blend length must equal layer_count")
        return self

    def blend_weights(self) -> np.ndarray:
        k = self.layer_count
        if self.layer_blend is None:
            return np.full(k + 1, 1.0 / (k + 1), dtype=np.float32)
        if isinstance(self.layer_blend, list):
            return np.asarray([1.0] + list(self.layer_blend), dtype=np.float32) / (k + 1)
        return np.full(k + 1, self.layer_blend, dtype=np.float32)


#: edge count above which the SpMM accumulates in fixed-size edge chunks.
#: The one-shot segment_sum materializes a (nnz, k) tensor (3.6 GB at
#: ML-20M/k=64, more with the backward pass) — that fits HBM as long as the
#: process isn't holding other multi-GB state, and it is MUCH faster than
#: the scan form (TPU scatter-add runs at a fixed row rate, so 28 chunked
#: scatters per SpMM cost minutes per epoch); the chunked fallback exists
#: for graphs whose edge tensor genuinely cannot fit.
_SPMM_CHUNK_MIN = 40_000_000
_SPMM_CHUNK = 524_288


def _spmm_chunked(vals, src_idx, dst_idx, src, n_dst):
    """dst[d] += Σ v·src[s] over edges, scanned in fixed-size chunks."""
    nnz = vals.shape[0]
    C = -(-nnz // _SPMM_CHUNK)
    pad = C * _SPMM_CHUNK - nnz
    v = jnp.pad(vals, (0, pad)).reshape(C, _SPMM_CHUNK)
    s = jnp.pad(src_idx, (0, pad)).reshape(C, _SPMM_CHUNK)
    d = jnp.pad(dst_idx, (0, pad), constant_values=n_dst).reshape(C, _SPMM_CHUNK)  # OOB -> drop

    def body(acc, xs):
        vv, ss, dd = xs
        return acc.at[dd].add(vv[:, None] * src[ss], mode="drop"), None

    acc, _ = jax.lax.scan(body, jnp.zeros((n_dst, src.shape[1]), src.dtype), (v, s, d))
    return acc


def propagate(u, i, conv, blend):
    """Symmetric-normalized LightGCN propagation; blended layer mean."""
    rows, cols, vals, n_users, n_items = conv
    if vals.shape[0] >= _SPMM_CHUNK_MIN:
        spmm = _spmm_chunked
    else:

        def spmm(v, s_idx, d_idx, src, n_dst):
            return jax.ops.segment_sum(v[:, None] * src[s_idx], d_idx, num_segments=n_dst)

    u_acc = u * blend[0]
    i_acc = i * blend[0]
    for l in range(1, len(blend)):
        u_new = spmm(vals, cols, rows, i, n_users)
        i_new = spmm(vals, rows, cols, u, n_items)
        u, i = u_new, i_new
        u_acc = u_acc + u * blend[l]
        i_acc = i_acc + i * blend[l]
    return u_acc, i_acc


class LightGCNScorer(UsesTrainer, Component):
    """LightGCN scorer (reference: graphs/lightgcn.py:108)."""

    config: LightGCNConfig

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

    def create_trainer(self, data, options):
        return LightGCNTrainer(self, data, options)

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
        scores[mask] = self.item_embeddings[item_nums[mask]] @ self.user_embeddings[user_num]
        return ItemList(items, scores=scores)

    def get_parameters(self):
        return {"user_embeddings": self.user_embeddings, "item_embeddings": self.item_embeddings}

    def load_parameters(self, state):
        self.user_embeddings = state["user_embeddings"]
        self.item_embeddings = state["item_embeddings"]


class LightGCNTrainer(ModelTrainer):
    """Trainer (reference: lightgcn.py:186; BPR/logistic at :312,319)."""

    def __init__(self, scorer: LightGCNScorer, data: Dataset, options: TrainingOptions):
        from lkpy_tpu.parallel.gradient import place_tree, table_rows

        self.scorer = scorer
        self.config = scorer.config
        self.mesh = options.mesh
        scorer.users = data.users
        scorer.items = data.items
        self.rng = options.random_generator()
        self.key = jax.random.key(int_seed(options.rng))
        self.n_users = data.user_count
        self.n_items = data.item_count
        # tables are row-sharded over the mesh's 'model' axis when training
        # distributed (SURVEY.md §2.3); pad row counts to shard evenly
        self.nu_pad = table_rows(self.n_users, self.mesh)
        self.ni_pad = table_rows(self.n_items, self.mesh)
        self.epochs_trained = 0

        csr = data.interaction_matrix().csr(None)
        coo = csr.to_coo()
        self._users = coo.row.astype(np.int32)
        self._items = coo.col.astype(np.int32)
        self.neg_index = DeviceCSRIndex.from_csr(csr)
        deg_u = np.maximum(np.diff(csr.rowptr), 1).astype(np.float32)
        deg_i = np.maximum(np.bincount(coo.col, minlength=self.n_items), 1).astype(np.float32)
        vals = (1.0 / np.sqrt(deg_u[coo.row] * deg_i[coo.col])).astype(np.float32)
        self.conv = (
            jnp.asarray(coo.row),
            jnp.asarray(coo.col),
            jnp.asarray(vals),
            self.nu_pad,
            self.ni_pad,
        )
        self.blend = jnp.asarray(self.config.blend_weights())

        self.key, k = jax.random.split(self.key)
        rows = {self.nu_pad, self.ni_pad}
        self.params = place_tree(
            self.mesh,
            init_params(k, self.nu_pad, self.ni_pad, self.config.embedding_size, False, False),
            rows,
        )
        self.opt = optax.adam(self.config.learning_rate)
        self.opt_state = place_tree(self.mesh, self.opt.init(self.params), rows)
        from lkpy_tpu.parallel.gradient import jit_sharded_epoch

        self._epoch = jit_sharded_epoch(
            self._build_step(), self.mesh, self.params, self.opt_state, rows
        )

    def _build_step(self):
        cfg = self.config
        conv = self.conv
        blend = self.blend
        reg = cfg.regularization
        loss_kind = cfg.loss
        neg_index = self.neg_index
        opt = self.opt

        def loss_fn(params, key, users, pos):
            u_eff, i_eff = propagate(params["u_embed"], params["i_embed"], conv, blend)
            negs = sample_negatives(key, neg_index, users, n=1)[:, 0]
            ue = u_eff[users]
            pe = i_eff[pos]
            ne = i_eff[negs]
            pos_s = jnp.sum(ue * pe, axis=-1)
            neg_s = jnp.sum(ue * ne, axis=-1)
            if loss_kind == "pairwise":
                loss = -jnp.mean(jax.nn.log_sigmoid(pos_s - neg_s))
            else:
                loss = -0.5 * (
                    jnp.mean(jax.nn.log_sigmoid(pos_s)) + jnp.mean(jax.nn.log_sigmoid(-neg_s))
                )
            if reg:
                # regularize the *ego* embeddings of the batch (standard BPR-reg)
                n0 = (
                    jnp.sum(params["u_embed"][users] ** 2)
                    + jnp.sum(params["i_embed"][pos] ** 2)
                    + jnp.sum(params["i_embed"][negs] ** 2)
                ) / users.shape[0]
                loss = loss + reg * 0.5 * n0
            return loss

        def step(params, opt_state, key, users, pos):
            loss, grads = jax.value_and_grad(loss_fn)(params, key, users, pos)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def train_epoch(self) -> float:
        """One epoch as ONE scanned device program (per-step dispatch cost
        dominated on tunneled backends; see gradient.py jit_sharded_epoch)."""
        n = len(self._users)
        perm = self.rng.permutation(n)
        bs = min(self.config.batch_size, n)
        if self.mesh is not None:
            d = self.mesh.shape["data"]
            bs = max(d, bs - bs % d)
        tail = n % bs
        if tail:
            perm = np.concatenate([perm, self.rng.choice(n, size=bs - tail)])
        n_steps = len(perm) // bs
        stacked = (
            jnp.asarray(self._users[perm]).reshape(n_steps, bs),
            jnp.asarray(self._items[perm]).reshape(n_steps, bs),
        )
        if self.mesh is not None:
            from lkpy_tpu.parallel.gradient import epoch_batch_sharding

            sh = epoch_batch_sharding(self.mesh)
            stacked = tuple(jax.device_put(a, sh) for a in stacked)
        self.params, self.opt_state, self.key, total = self._epoch(
            self.params, self.opt_state, self.key, *stacked
        )
        self.epochs_trained += 1
        return float(total) / n_steps if n_steps else 0.0  # ONE readback per epoch

    def finalize(self):
        u_eff, i_eff = propagate(self.params["u_embed"], self.params["i_embed"], self.conv, self.blend)
        self.scorer.user_embeddings = np.asarray(u_eff)[: self.n_users]
        self.scorer.item_embeddings = np.asarray(i_eff)[: self.n_items]

    def get_parameters(self):
        sizes = {"u_embed": self.n_users, "i_embed": self.n_items}
        return {k: np.asarray(v)[: sizes.get(k, None)] for k, v in self.params.items()}

    def load_parameters(self, state):
        from lkpy_tpu.parallel.gradient import place_tree

        rows = {self.nu_pad, self.ni_pad}
        params = {}
        for k, v in state.items():
            v = np.asarray(v)
            pad_to = self.nu_pad if k.startswith("u_") else self.ni_pad
            if v.shape[0] < pad_to:
                v = np.concatenate([v, np.zeros((pad_to - v.shape[0],) + v.shape[1:], v.dtype)])
            params[k] = jnp.asarray(v)
        self.params = place_tree(self.mesh, params, rows)
        self.opt_state = place_tree(self.mesh, self.opt.init(self.params), rows)
