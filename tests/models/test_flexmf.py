import numpy as np
import pickle
import pytest

from lkpy_tpu.data import ItemList
from lkpy_tpu.metrics import quick_measure_model
from lkpy_tpu.models.flexmf import (
    FlexMFExplicitScorer,
    FlexMFImplicitConfig,
    FlexMFImplicitScorer,
)
from lkpy_tpu.training import TrainingOptions


def test_preset_bpr():
    cfg = FlexMFImplicitConfig(preset="bpr")
    assert cfg.loss == "pairwise"
    assert cfg.selected_negative_strategy() == "uniform"


def test_preset_warp():
    cfg = FlexMFImplicitConfig(preset="warp")
    assert cfg.loss == "warp"
    assert cfg.selected_negative_strategy() == "misranked"


def test_preset_lightgcn():
    cfg = FlexMFImplicitConfig(preset="lightgcn")
    assert cfg.convolution_layers == 2


def test_invalid_warp_strategy():
    with pytest.raises(ValueError):
        FlexMFImplicitConfig(loss="warp", negative_strategy="uniform")


def test_explicit_trains(ml_ds):
    s = FlexMFExplicitScorer(features=16, epochs=2)
    s.train(ml_ds, TrainingOptions(rng=42))
    out = s(query=1, items=ItemList(item_ids=[31, 1029, 9999999]))
    sc = out.scores()
    assert np.isfinite(sc[:2]).all()
    assert np.isnan(sc[2])
    assert 0 < sc[0] < 6


def test_implicit_logistic_trains(ml_ds):
    s = FlexMFImplicitScorer(features=16, epochs=2)
    s.train(ml_ds, TrainingOptions(rng=42))
    out = s(query=1, items=ItemList(item_ids=[31, 1029]))
    assert np.isfinite(out.scores()).all()


def test_implicit_bpr_trains(ml_ds):
    s = FlexMFImplicitScorer(features=16, epochs=2, preset="bpr")
    s.train(ml_ds, TrainingOptions(rng=42))
    out = s(query=1, items=ItemList(item_ids=[31]))
    assert np.isfinite(out.scores()).all()


def test_implicit_warp_trains(ml_ds):
    s = FlexMFImplicitScorer(features=16, epochs=2, preset="warp", warp_candidates=16)
    s.train(ml_ds, TrainingOptions(rng=42))
    out = s(query=1, items=ItemList(item_ids=[31]))
    assert np.isfinite(out.scores()).all()


def test_lightgcn_preset_trains(ml_ds):
    s = FlexMFImplicitScorer(features=8, epochs=1, preset="lightgcn")
    s.train(ml_ds, TrainingOptions(rng=42))
    out = s(query=1, items=ItemList(item_ids=[31]))
    assert np.isfinite(out.scores()).all()


def test_pickle(ml_ds):
    s = FlexMFImplicitScorer(features=8, epochs=1)
    s.train(ml_ds, TrainingOptions(rng=42))
    s2 = pickle.loads(pickle.dumps(s))
    items = ItemList(item_ids=[31, 1029])
    np.testing.assert_allclose(s2(query=1, items=items).scores(), s(query=1, items=items).scores())


@pytest.mark.eval
def test_explicit_gate(ml_ds):
    """Reference gate: FlexMF explicit RMSE 0.96 +/- 0.05
    (tests/flexmf/test_flexmf_explicit.py:15)."""
    res = quick_measure_model(
        FlexMFExplicitScorer(), ml_ds, predicts_ratings=True, rng=42, user_frac=0.5
    )
    rmse = res.list_summary().loc["RMSE", "mean"]
    assert 0.85 <= rmse <= 1.05


@pytest.mark.eval
def test_implicit_logistic_gate(ml_ds):
    """Reference gate: FlexMF implicit NDCG 0.01-0.25
    (tests/flexmf/test_flexmf_implicit.py:16)."""
    res = quick_measure_model(FlexMFImplicitScorer(), ml_ds, rng=42, user_frac=0.5)
    assert res.list_summary().loc["NDCG@20", "mean"] >= 0.01


@pytest.mark.eval
def test_implicit_bpr_gate(ml_ds):
    res = quick_measure_model(FlexMFImplicitScorer(preset="bpr"), ml_ds, rng=42, user_frac=0.5)
    assert res.list_summary().loc["NDCG@20", "mean"] >= 0.01


# the default-config WARP gate (floor 0.01, ~40 s: the WARP misrank search
# dominates) is strictly subsumed by TestFlexMFWARPGrid's eval gate in
# test_scorer_grid.py (realistic config, floor 0.18, measured 0.304)
