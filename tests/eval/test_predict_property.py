"""Prediction-metric property tests: RMSE/MAE formulas and missing-data
policies over random prediction/truth pairs (reference semantics:
metrics/predict.py:114,147)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from lkpy_tpu.data import ItemList
from lkpy_tpu.metrics.predict import MAE, RMSE

FAST = settings(max_examples=40, deadline=None)


@st.composite
def pred_truth(draw, aligned=True):
    n = draw(st.integers(1, 30))
    ids = np.arange(1, n + 1, dtype=np.int64)
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    preds = rng.uniform(0.5, 5.0, n).astype(np.float32)
    truth = rng.uniform(0.5, 5.0, n).astype(np.float32)
    p = ItemList(item_ids=ids, scores=preds)
    t = ItemList(item_ids=ids, rating=truth)
    return p, t, preds, truth


@FAST
@given(pred_truth())
def test_rmse_formula(data):
    p, t, preds, truth = data
    got = RMSE().measure_list(p, t)
    want = float(np.sqrt(np.mean((preds.astype(np.float64) - truth) ** 2)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@FAST
@given(pred_truth())
def test_mae_formula(data):
    p, t, preds, truth = data
    got = MAE().measure_list(p, t)
    want = float(np.mean(np.abs(preds.astype(np.float64) - truth)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@FAST
@given(pred_truth())
def test_rmse_dominates_mae(data):
    p, t, preds, truth = data
    assert RMSE().measure_list(p, t) >= MAE().measure_list(p, t) - 1e-9


@FAST
@given(pred_truth())
def test_missing_scores_policy(data):
    """Predictions covering only half the test items: 'error' raises,
    'ignore' scores the matched subset."""
    p, t, preds, truth = data
    assume(len(p) >= 2)
    half = len(p) // 2
    p_half = ItemList(item_ids=p.ids()[:half], scores=preds[:half])
    with pytest.raises(Exception):
        RMSE().measure_list(p_half, t)
    got = RMSE("ignore", "ignore").measure_list(p_half, t)
    want = float(np.sqrt(np.mean((preds[:half].astype(np.float64) - truth[:half]) ** 2)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@FAST
@given(pred_truth())
def test_missing_truth_policy(data):
    """Predictions for items missing from the truth: 'ignore' drops them."""
    p, t, preds, truth = data
    extra_ids = np.concatenate([p.ids(), p.ids() + 1000])
    extra_scores = np.concatenate([preds, preds])
    p_extra = ItemList(item_ids=extra_ids, scores=extra_scores)
    got = RMSE("ignore", "ignore").measure_list(p_extra, t)
    want = float(np.sqrt(np.mean((preds.astype(np.float64) - truth) ** 2)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@FAST
@given(pred_truth())
def test_perfect_predictions_zero_error(data):
    p, t, preds, truth = data
    exact = ItemList(item_ids=p.ids(), scores=truth)
    assert RMSE().measure_list(exact, t) == 0.0
    assert MAE().measure_list(exact, t) == 0.0
