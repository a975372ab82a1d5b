import numpy as np
import pytest

from lkpy_tpu.data import ItemList
from lkpy_tpu.metrics import quick_measure_model
from lkpy_tpu.models.lightgcn import LightGCNConfig, LightGCNScorer
from lkpy_tpu.training import TrainingOptions


def test_config_blend():
    cfg = LightGCNConfig(layer_count=2)
    w = cfg.blend_weights()
    assert w == pytest.approx([1 / 3] * 3)
    with pytest.raises(ValueError):
        LightGCNConfig(layer_count=2, layer_blend=[0.5])


def test_trains(ml_ds):
    s = LightGCNScorer(embedding_size=8, epochs=2)
    s.train(ml_ds, TrainingOptions(rng=42))
    out = s(query=1, items=ItemList(item_ids=[31, 1029, 9999999]))
    sc = out.scores()
    assert np.isfinite(sc[:2]).all()
    assert np.isnan(sc[2])


def test_unknown_user(ml_ds):
    s = LightGCNScorer(embedding_size=8, epochs=1)
    s.train(ml_ds, TrainingOptions(rng=42))
    out = s(query=999999, items=ItemList(item_ids=[31]))
    assert np.isnan(out.scores()).all()


@pytest.mark.eval
def test_lightgcn_gate(ml_ds):
    """LightGCN should beat the weak implicit gate (NDCG >= 0.01; the
    reference's LightGCN tests use ScorerTests with similar bars)."""
    res = quick_measure_model(LightGCNScorer(embedding_size=32, epochs=10), ml_ds, rng=42, user_frac=0.5)
    assert res.list_summary().loc["NDCG@20", "mean"] >= 0.05
