"""
Gradient-family (FlexMF / LightGCN) mesh-sharded training equivalence.

The product trainers honor ``TrainingOptions.mesh`` (reference analog: the
torch training loop src/lenskit/flexmf/_training.py:39 is the whole path —
single device; here the sharded step IS the product path).  With identical
seeds and batch schedules, a sharded epoch must match the single-device
epoch up to reduction-order float noise.
"""

import jax
import numpy as np
import pandas as pd
import pytest

from lkpy_tpu.data import from_interactions_df
from lkpy_tpu.models.flexmf import FlexMFExplicitScorer, FlexMFImplicitScorer
from lkpy_tpu.models.lightgcn import LightGCNScorer
from lkpy_tpu.parallel import MeshSpec, make_mesh
from lkpy_tpu.training import TrainingOptions


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests need the 8-device virtual CPU mesh"
    return make_mesh(MeshSpec(data=4, model=2))


@pytest.fixture(scope="module")
def ds():
    rng = np.random.default_rng(1234)
    n_users, n_items, n_draw = 200, 300, 5000
    i_w = 1.0 / np.arange(1, n_items + 1) ** 0.7
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n_draw),
            "item_id": rng.choice(n_items, n_draw, p=i_w / i_w.sum()),
            "rating": rng.integers(1, 6, n_draw).astype(np.float32),
        }
    ).drop_duplicates(["user_id", "item_id"])
    return from_interactions_df(df)


def _train_pair(scorer_cls, cfg, ds, mesh, seed=42):
    single = scorer_cls(scorer_cls.validate_config(cfg))
    single.train(ds, TrainingOptions(rng=seed))
    sharded = scorer_cls(scorer_cls.validate_config(cfg))
    sharded.train(ds, TrainingOptions(rng=seed, mesh=mesh))
    return single, sharded


def test_flexmf_bpr_sharded_matches_single(mesh, ds):
    cfg = {"features": 16, "epochs": 2, "loss": "pairwise", "batch_size": 1024}
    single, sharded = _train_pair(FlexMFImplicitScorer, cfg, ds, mesh)
    np.testing.assert_allclose(
        sharded.params["i_embed"], single.params["i_embed"], atol=5e-4, rtol=5e-4
    )
    np.testing.assert_allclose(
        sharded.params["u_embed"], single.params["u_embed"], atol=5e-4, rtol=5e-4
    )


def test_flexmf_warp_sharded_matches_single(mesh, ds):
    cfg = {"features": 16, "epochs": 1, "loss": "warp", "batch_size": 1024, "warp_candidates": 16}
    single, sharded = _train_pair(FlexMFImplicitScorer, cfg, ds, mesh)
    np.testing.assert_allclose(
        sharded.params["i_embed"], single.params["i_embed"], atol=5e-4, rtol=5e-4
    )


def test_flexmf_explicit_sharded_matches_single(mesh, ds):
    cfg = {"features": 16, "epochs": 2, "batch_size": 1024}
    single, sharded = _train_pair(FlexMFExplicitScorer, cfg, ds, mesh)
    np.testing.assert_allclose(
        sharded.params["i_embed"], single.params["i_embed"], atol=5e-4, rtol=5e-4
    )
    assert sharded.global_bias == pytest.approx(single.global_bias)


def test_lightgcn_sharded_matches_single(mesh, ds):
    cfg = {"embedding_size": 8, "epochs": 2, "batch_size": 1024, "layer_count": 1}
    single, sharded = _train_pair(LightGCNScorer, cfg, ds, mesh)
    np.testing.assert_allclose(
        sharded.item_embeddings, single.item_embeddings, atol=5e-4, rtol=5e-4
    )
    np.testing.assert_allclose(
        sharded.user_embeddings, single.user_embeddings, atol=5e-4, rtol=5e-4
    )


def test_sharded_tables_actually_sharded(mesh, ds):
    """The trained tables live row-sharded over 'model' during training."""
    from lkpy_tpu.models.flexmf import FlexMFImplicitTrainer

    scorer = FlexMFImplicitScorer(FlexMFImplicitScorer.validate_config({"features": 16, "epochs": 1}))
    trainer = FlexMFImplicitTrainer(scorer, ds, TrainingOptions(rng=0, mesh=mesh))
    trainer.train_epoch()
    sharding = trainer.params["i_embed"].sharding
    spec = sharding.spec
    assert spec[0] == "model", f"i_embed not row-sharded: {spec}"
    # padded table rows divide evenly over the model axis
    assert trainer.params["i_embed"].shape[0] % mesh.shape["model"] == 0


def test_sharded_checkpoint_roundtrip(mesh, ds):
    """get_parameters/load_parameters cross single-device <-> sharded."""
    from lkpy_tpu.models.flexmf import FlexMFImplicitTrainer

    cfg = FlexMFImplicitScorer.validate_config({"features": 16, "epochs": 1})
    s1 = FlexMFImplicitScorer(cfg)
    t1 = FlexMFImplicitTrainer(s1, ds, TrainingOptions(rng=0))
    t1.train_epoch()
    state = t1.get_parameters()
    assert state["i_embed"].shape[0] == ds.item_count  # unpadded on the way out

    s2 = FlexMFImplicitScorer(cfg)
    t2 = FlexMFImplicitTrainer(s2, ds, TrainingOptions(rng=1, mesh=mesh))
    t2.load_parameters(state)
    out = t2.get_parameters()
    np.testing.assert_allclose(out["i_embed"], state["i_embed"], atol=1e-6)
