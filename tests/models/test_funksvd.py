import numpy as np
import pytest

from lkpy_tpu.data import ItemList
from lkpy_tpu.metrics import quick_measure_model
from lkpy_tpu.models.funksvd import FunkSVDScorer
from lkpy_tpu.training import TrainingOptions


def test_funksvd_trains_small(ml_ds):
    s = FunkSVDScorer(features=8, epochs=10)
    s.train(ml_ds, TrainingOptions(rng=42))
    assert s.user_embeddings.shape == (ml_ds.user_count, 8)
    assert np.isfinite(s.user_embeddings).all()
    out = s(query=1, items=ItemList(item_ids=[31, 1029, 99999999]))
    sc = out.scores()
    assert np.isfinite(sc[:2]).all()
    assert 0 < sc[0] < 6


def test_funksvd_unknown_user(ml_ds):
    s = FunkSVDScorer(features=4, epochs=5)
    s.train(ml_ds, TrainingOptions(rng=42))
    out = s(query=999999, items=ItemList(item_ids=[31]))
    assert np.isnan(out.scores()).all()


@pytest.mark.eval
@pytest.mark.slow
def test_funksvd_gate(ml_ds):
    """Reference gate: FunkSVD RMSE 0.87-0.97 (tests/funksvd/test_funksvd.py:33)."""
    res = quick_measure_model(
        FunkSVDScorer(features=64, epochs=100), ml_ds, predicts_ratings=True, rng=42
    )
    rmse = res.list_summary().loc["RMSE", "mean"]
    assert 0.8 <= rmse <= 1.0
