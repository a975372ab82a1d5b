"""
FlexMF configuration/loss semantics (VERDICT r2 #9; reference analog:
tests/flexmf/ config and loss tests, flexmf/_implicit.py:49-141).
"""

import numpy as np
import pytest
from pydantic import ValidationError

from lkpy_tpu.models.flexmf import (
    FlexMFExplicitConfig,
    FlexMFImplicitConfig,
    FlexMFImplicitScorer,
)


def test_presets():
    # reference presets (flexmf/_implicit.py PRESETS)
    bpr = FlexMFImplicitConfig(preset="bpr")
    assert bpr.loss == "pairwise"
    warp = FlexMFImplicitConfig(preset="warp")
    assert warp.loss == "warp"
    lg = FlexMFImplicitConfig(preset="lightgcn")
    assert lg.loss == "pairwise"
    assert lg.convolution_layers == 2


def test_unknown_preset_rejected():
    with pytest.raises((ValidationError, ValueError)):
        FlexMFImplicitConfig(preset="nope")


def test_warp_requires_misranked():
    with pytest.raises((ValidationError, ValueError), match="misranked"):
        FlexMFImplicitConfig(loss="warp", negative_strategy="uniform")


def test_misranked_single_negative_only():
    with pytest.raises((ValidationError, ValueError), match="single"):
        FlexMFImplicitConfig(loss="warp", negative_count=3)


def test_default_negative_strategy():
    assert FlexMFImplicitConfig(loss="warp").selected_negative_strategy() == "misranked"
    assert FlexMFImplicitConfig(loss="logistic").selected_negative_strategy() == "uniform"
    assert FlexMFImplicitConfig(loss="pairwise").selected_negative_strategy() == "uniform"


def test_explicit_config_defaults_l2():
    cfg = FlexMFExplicitConfig()
    assert cfg.reg_method == "L2"
    assert cfg.regularization == pytest.approx(0.1)


def test_embedding_size_exp():
    cfg = FlexMFImplicitConfig(embedding_size_exp=5)
    assert cfg.embedding_size == 32


def test_features_alias():
    cfg = FlexMFImplicitConfig(features=48)
    assert cfg.embedding_size == 48


def test_warp_rank_weight_formula():
    """The WARP rank weight is the harmonic-number approximation
    H(rank) ≈ ln(r) + γ + 1/2r − 1/12r² + 1/120r⁴ (reference
    _implicit.py:399-415 loss weighting)."""
    r = np.array([1.0, 2.0, 10.0, 100.0])
    approx = np.log(r) + np.euler_gamma + 1 / (2 * r) - 1 / (12 * r**2) + 1 / (120 * r**4)
    exact = np.array([np.sum(1.0 / np.arange(1, int(n) + 1)) for n in r])
    np.testing.assert_allclose(approx, exact, rtol=3e-3)  # worst at r=1: 0.22%


def test_user_bias_default_depends_on_loss(ml_ds):
    from lkpy_tpu.models.flexmf import FlexMFImplicitTrainer
    from lkpy_tpu.training import TrainingOptions

    # logistic gets user bias by default; pairwise does not (reference
    # _implicit.py:141 user_bias defaulting)
    s_log = FlexMFImplicitScorer(FlexMFImplicitScorer.validate_config({"loss": "logistic", "epochs": 1, "features": 8}))
    t_log = FlexMFImplicitTrainer(s_log, ml_ds, TrainingOptions(rng=0))
    assert "u_bias" in t_log.params

    s_bpr = FlexMFImplicitScorer(FlexMFImplicitScorer.validate_config({"loss": "pairwise", "epochs": 1, "features": 8}))
    t_bpr = FlexMFImplicitTrainer(s_bpr, ml_ds, TrainingOptions(rng=0))
    assert "u_bias" not in t_bpr.params
