"""
LightGCN graph recommender (He et al. 2020).

Capability parity with the reference ``LightGCNScorer``
(reference: src/lenskit/graphs/lightgcn.py:42,108,186,312,319), which wraps
``torch_geometric.nn.LightGCN``.  TPU-native: propagation runs through the
shared graph ops (``lkpy_tpu.ops.graph`` — sorted segment-sum SpMM for
small graphs, a dense bf16 MXU adjacency for HBM-sized ones), with BPR or
logistic loss and Bloom-verified negative sampling inside the scanned
epoch program — sharing the FlexMF embedding machinery (the reference's
``FlexMFModel`` likewise unifies MF + LightGCN layers, flexmf/_model.py:18).
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
from lkpy_tpu.ops.graph import (  # noqa: F401 — re-exported for tests/back-compat
    _SPMM_CHUNK,
    _SPMM_CHUNK_MIN,
    build_dense_adjacency,
    dense_adjacency_eligible,
    propagate,
    propagate_dense,
    sorted_conv,
)
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
        # row-major base edges + a column-sorted copy: both SpMM directions
        # then run as SORTED segment sums — the unsorted scatter lowers to a
        # device sort of all 14M ML-20M edges per reduction (seconds/step)
        self.conv = sorted_conv(coo.row, coo.col, vals, self.nu_pad, self.ni_pad)
        # big graphs propagate through a dense bf16 adjacency on the MXU
        # (ops/graph.py); small graphs keep the segment-sum form
        self._adj = None
        if dense_adjacency_eligible(len(coo.row), self.nu_pad, self.ni_pad, mesh=self.mesh):
            # with a mesh, the adjacency row-shards over the 'model' axis —
            # catalogs past single-chip HBM still propagate on the MXU
            self._adj = build_dense_adjacency(
                self.conv[0], self.conv[1], self.conv[2], self.nu_pad, self.ni_pad, mesh=self.mesh
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
            self._build_step(), self.mesh, self.params, self.opt_state, rows, n_const=len(self._epoch_consts)
        )

    def _build_step(self):
        """Build the train step.  The edge arrays and sampling index are
        ARGUMENTS (threaded through jit_sharded_epoch's consts), not
        closures — closed-over device arrays embed in the program as
        constants, and ML-20M's 14M-edge arrays made a 168 MB program the
        compile service rejects."""
        cfg = self.config
        blend = self.blend
        reg = cfg.regularization
        loss_kind = cfg.loss
        opt = self.opt
        nu_pad, ni_pad = self.nu_pad, self.ni_pad
        idx_rows, idx_cols = self.neg_index.n_rows, self.neg_index.n_cols
        log2_bits = self.neg_index.log2_bits

        use_dense = self._adj is not None

        def loss_fn(params, key, *args):
            if use_dense:
                adj, neg_rowptr, neg_colind, neg_bloom, users, pos = args
            else:
                (rows, cols, vals, rows_c, cols_c, vals_c,
                 neg_rowptr, neg_colind, neg_bloom, users, pos) = args
            neg_index = DeviceCSRIndex(
                neg_rowptr, neg_colind, idx_rows, idx_cols, neg_bloom, log2_bits
            )
            if use_dense:
                u_eff, i_eff = propagate_dense(params["u_embed"], params["i_embed"], adj, blend)
            else:
                conv = (rows, cols, vals, nu_pad, ni_pad, rows_c, cols_c, vals_c)
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

        def step(params, opt_state, key, *args):
            loss, grads = jax.value_and_grad(loss_fn)(params, key, *args)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def _build_main_vag(self):
        """Loss+grad WITHOUT the ego-regularization term — the big-graph
        split-step path (see train_epoch): fusing the raw-table reg gathers
        with the full-graph propagate backward crashes the TPU compiler."""
        cfg = self.config
        blend = self.blend
        loss_kind = cfg.loss
        nu_pad, ni_pad = self.nu_pad, self.ni_pad
        idx_rows, idx_cols = self.neg_index.n_rows, self.neg_index.n_cols
        log2_bits = self.neg_index.log2_bits

        use_dense = self._adj is not None

        def main_loss(params, key, *args):
            if use_dense:
                adj, neg_rowptr, neg_colind, neg_bloom, users, pos = args
            else:
                (rows, cols, vals, rows_c, cols_c, vals_c,
                 neg_rowptr, neg_colind, neg_bloom, users, pos) = args
            neg_index = DeviceCSRIndex(
                neg_rowptr, neg_colind, idx_rows, idx_cols, neg_bloom, log2_bits
            )
            if use_dense:
                u_eff, i_eff = propagate_dense(params["u_embed"], params["i_embed"], adj, blend)
            else:
                conv = (rows, cols, vals, nu_pad, ni_pad, rows_c, cols_c, vals_c)
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
            return loss, negs

        def vag(params, key, *args):
            (loss, negs), grads = jax.value_and_grad(main_loss, has_aux=True)(
                params, key, *args
            )
            return loss, negs, grads

        return vag

    def _build_apply(self):
        """Ego-regularization gradient + Adam apply (the split-step's second
        program; contains no propagate, so it compiles at any scale)."""
        reg = self.config.regularization
        opt = self.opt

        def reg_loss(params, users, pos, negs):
            n0 = (
                jnp.sum(params["u_embed"][users] ** 2)
                + jnp.sum(params["i_embed"][pos] ** 2)
                + jnp.sum(params["i_embed"][negs] ** 2)
            ) / users.shape[0]
            return reg * 0.5 * n0

        def apply(params, opt_state, grads, users, pos, negs):
            if reg:
                l2, g2 = jax.value_and_grad(reg_loss)(params, users, pos, negs)
                grads = jax.tree.map(jnp.add, grads, g2)
            else:
                l2 = jnp.float32(0.0)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, l2

        return apply

    @property
    def _epoch_consts(self):
        """Non-scanned step arguments: edge structure + sampling index."""
        if self._adj is not None:
            return (
                self._adj,
                self.neg_index.rowptr,
                self.neg_index.colind,
                self.neg_index.bloom,
            )
        return (
            self.conv[0],
            self.conv[1],
            self.conv[2],
            self.conv[5],
            self.conv[6],
            self.conv[7],
            self.neg_index.rowptr,
            self.neg_index.colind,
            self.neg_index.bloom,
        )

    #: edge count above which the epoch falls back to per-step dispatch —
    #: the TPU AOT compiler rejects a lax.scan whose body carries a
    #: multi-GB full-graph propagate (compile-helper crash at ML-20M even
    #: with the edge arrays as arguments), and at that scale the propagate
    #: compute (~40 ms/step) hides the per-step dispatch latency anyway
    _SCAN_MAX_EDGES = 4_000_000

    def train_epoch(self) -> float:
        """One epoch as ONE scanned device program where the graph allows
        (see gradient.py jit_sharded_epoch), per-step dispatch otherwise."""
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
        if self.mesh is None:
            # resident interaction arrays + one int32 perm upload per epoch
            # (the host-gather form shipped ~2 × nnz × 8 B of gathered
            # batches per epoch over the tunnel; see flexmf.py train_epoch)
            if getattr(self, "_base_dev", None) is None:
                self._base_dev = (jnp.asarray(self._users), jnp.asarray(self._items))
            perm_dev = jnp.asarray(perm.astype(np.int32, copy=False))
            users = jnp.take(self._base_dev[0], perm_dev, axis=0).reshape(n_steps, bs)
            items = jnp.take(self._base_dev[1], perm_dev, axis=0).reshape(n_steps, bs)
        else:
            users = jnp.asarray(self._users[perm]).reshape(n_steps, bs)
            items = jnp.asarray(self._items[perm]).reshape(n_steps, bs)
        if self.mesh is not None:
            from lkpy_tpu.parallel.gradient import epoch_batch_sharding

            sh = epoch_batch_sharding(self.mesh)
            users, items = (jax.device_put(a, sh) for a in (users, items))
        if self._adj is not None or len(self._users) <= self._SCAN_MAX_EDGES:
            self.params, self.opt_state, self.key, total = self._epoch(
                self.params, self.opt_state, self.key, *self._epoch_consts, users, items
            )
        else:
            # TWO programs per step: the main loss+grad (propagate inside)
            # and the ego-regularization + Adam apply.  Fusing the raw-table
            # reg gathers into the same program as the full-graph propagate
            # backward crashes the TPU compiler at ML-20M scale (bisected:
            # the i_embed reg gather specifically; optimization_barrier
            # does not help) — splitting also keeps each program small.
            if not hasattr(self, "_vag"):
                if self.mesh is None:
                    self._vag = jax.jit(self._build_main_vag())
                    self._apply = jax.jit(self._build_apply(), donate_argnums=(0, 1))
                else:
                    # pin the table shardings on the outputs so the
                    # compiler cannot silently re-replicate the row-sharded
                    # tables across steps (same contract as
                    # gradient.py::jit_sharded_epoch)
                    from lkpy_tpu.parallel.gradient import leaf_sharding

                    rows = {self.nu_pad, self.ni_pad}
                    ps = jax.tree.map(lambda l: leaf_sharding(self.mesh, l, rows), self.params)
                    os_ = jax.tree.map(
                        lambda l: leaf_sharding(self.mesh, l, rows), self.opt_state
                    )
                    self._vag = jax.jit(
                        self._build_main_vag(), out_shardings=(None, None, ps)
                    )
                    self._apply = jax.jit(
                        self._build_apply(),
                        out_shardings=(ps, os_, None),
                        donate_argnums=(0, 1),
                    )
            total = None
            for s in range(n_steps):
                self.key, k = jax.random.split(self.key)
                l1, negs, grads = self._vag(
                    self.params, k, *self._epoch_consts, users[s], items[s]
                )
                self.params, self.opt_state, l2 = self._apply(
                    self.params, self.opt_state, grads, users[s], items[s], negs
                )
                loss = l1 + l2
                total = loss if total is None else total + loss
                if (s + 1) % 64 == 0:
                    jax.block_until_ready(total)
        self.epochs_trained += 1
        return float(total) / n_steps if n_steps else 0.0  # ONE readback per epoch

    def finalize(self):
        if self._adj is not None:
            u_eff, i_eff = propagate_dense(
                self.params["u_embed"], self.params["i_embed"], self._adj, self.blend
            )
        else:
            u_eff, i_eff = propagate(
                self.params["u_embed"], self.params["i_embed"], self.conv, self.blend
            )
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
