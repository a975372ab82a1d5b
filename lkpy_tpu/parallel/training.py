"""
Distributed training steps.

The multi-chip training path (SURVEY.md §2.3, BASELINE north star):
embedding/factor tables row-sharded over the ``model`` mesh axis, training
batches sharded over ``data``; XLA/GSPMD inserts the all-gather/all-to-all
for embedding lookups and psum for gradient reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lkpy_tpu.parallel.mesh import get_mesh

__all__ = ["DistributedMFTrainer", "make_distributed_step"]


def param_shardings(mesh: Mesh):
    """Row-shard embedding tables over 'model'; biases replicated."""
    return {
        "u_embed": NamedSharding(mesh, P("model", None)),
        "i_embed": NamedSharding(mesh, P("model", None)),
        "u_bias": NamedSharding(mesh, P("model")),
        "i_bias": NamedSharding(mesh, P("model")),
    }


def make_distributed_step(opt, loss_kind: str = "pairwise", mesh: Mesh | None = None):
    """
    Build a jitted data+model-parallel MF train step.

    Inputs: params (tables row-sharded over 'model'), batch (users, pos, neg)
    sharded over 'data'.  The embedding gathers cross the 'model' axis
    (GSPMD all-gather/all-to-all); gradient reduction crosses 'data' (psum).
    """
    mesh = mesh or get_mesh()

    def loss_fn(params, users, pos, neg):
        ue = params["u_embed"][users]
        pe = params["i_embed"][pos]
        ne = params["i_embed"][neg]
        pos_s = jnp.sum(ue * pe, axis=-1) + params["i_bias"][pos]
        neg_s = jnp.sum(ue * ne, axis=-1) + params["i_bias"][neg]
        if loss_kind == "pairwise":
            return -jnp.mean(jax.nn.log_sigmoid(pos_s - neg_s))
        return -0.5 * (jnp.mean(jax.nn.log_sigmoid(pos_s)) + jnp.mean(jax.nn.log_sigmoid(-neg_s)))

    p_shard = param_shardings(mesh)
    batch_shard = NamedSharding(mesh, P("data"))

    def step(params, opt_state, users, pos, neg):
        loss, grads = jax.value_and_grad(loss_fn)(params, users, pos, neg)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shardings_for(params):
        return {k: p_shard[k] for k in params}

    def compiled(params, opt_state, users, pos, neg):
        ps = shardings_for(params)
        jitted = jax.jit(
            step,
            in_shardings=(ps, None, batch_shard, batch_shard, batch_shard),
            out_shardings=(ps, None, None),
        )
        return jitted(params, opt_state, users, pos, neg)

    return compiled


class DistributedMFTrainer:
    """
    Data+model-parallel MF training driver for multi-chip meshes.

    This is the scaling path for the FlexMF/LightGCN family: construct with a
    mesh, feed host batches, and the step runs sharded.
    """

    def __init__(
        self,
        n_users: int,
        n_items: int,
        embedding_size: int = 64,
        *,
        learning_rate: float = 0.01,
        loss: str = "pairwise",
        mesh: Mesh | None = None,
        seed: int = 42,
    ):
        self.mesh = mesh or get_mesh()
        key = jax.random.key(seed)
        ks = jax.random.split(key, 4)
        shards = param_shardings(self.mesh)
        # round table sizes up to multiples of the model-axis size so rows
        # shard evenly (padding rows are never referenced by real IDs)
        m = self.mesh.shape["model"]
        nu = ((n_users + m - 1) // m) * m
        ni = ((n_items + m - 1) // m) * m
        self.params = {
            "u_embed": jax.device_put(
                jax.random.normal(ks[0], (nu, embedding_size), dtype=jnp.float32) * 0.1,
                shards["u_embed"],
            ),
            "i_embed": jax.device_put(
                jax.random.normal(ks[1], (ni, embedding_size), dtype=jnp.float32) * 0.1,
                shards["i_embed"],
            ),
            "i_bias": jax.device_put(
                jax.random.normal(ks[2], (ni,), dtype=jnp.float32) * 0.1, shards["i_bias"]
            ),
        }
        self.opt = optax.adam(learning_rate)
        self.opt_state = self.opt.init(self.params)
        self._step = make_distributed_step(self.opt, loss, self.mesh)

    def train_batch(self, users: np.ndarray, pos: np.ndarray, neg: np.ndarray) -> float:
        d = self.mesh.shape["data"]
        b = len(users) - (len(users) % d) if len(users) % d else len(users)
        batch_shard = NamedSharding(self.mesh, P("data"))
        ju = jax.device_put(jnp.asarray(users[:b], dtype=jnp.int32), batch_shard)
        jp = jax.device_put(jnp.asarray(pos[:b], dtype=jnp.int32), batch_shard)
        jn = jax.device_put(jnp.asarray(neg[:b], dtype=jnp.int32), batch_shard)
        self.params, self.opt_state, loss = self._step(self.params, self.opt_state, ju, jp, jn)
        return float(loss)
