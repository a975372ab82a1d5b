"""
Stochastic ranker distribution semantics (VERDICT r2 #9; reference analog:
tests for stochastic/_ranker.py:59 — Plackett-Luce / softmax sampling via
Gumbel-top-k).
"""

import numpy as np
import pytest

from lkpy_tpu.data import ItemList, RecQuery
from lkpy_tpu.models.stochastic import StochasticTopNRanker, stochastic_rank


def scored(scores):
    return ItemList(item_ids=np.arange(len(scores)), scores=np.asarray(scores, dtype=np.float32))


def test_output_is_permutation_subset():
    r = StochasticTopNRanker(StochasticTopNRanker.validate_config({"n": 3, "rng": 42}))
    il = scored([5.0, 1.0, 3.0, 2.0, 4.0])
    out = r(il, query=RecQuery(user_id=1))
    assert len(out) == 3
    assert out.ordered
    assert len(set(out.ids().tolist())) == 3
    assert set(out.ids().tolist()).issubset(set(range(5)))


def test_deterministic_per_query_seed():
    r = StochasticTopNRanker(StochasticTopNRanker.validate_config({"n": 3, "rng": 42}))
    il = scored([5.0, 1.0, 3.0, 2.0, 4.0])
    a = r(il, query=RecQuery(user_id=7))
    b = r(il, query=RecQuery(user_id=7))
    assert list(a.ids()) == list(b.ids())


def test_higher_scores_win_more_often():
    """Gumbel-top-1 samples ∝ softmax(score): over many draws the top-scored
    item must be picked first far more often than the lowest."""
    il = scored([3.0, 0.0, 0.0, 0.0])
    firsts = []
    for seed in range(300):
        out = stochastic_rank(il, 1, seed)
        firsts.append(int(out.ids()[0]))
    share0 = np.mean(np.asarray(firsts) == 0)
    # softmax([3,0,0,0]) gives p0 ≈ e³/(e³+3) ≈ 0.87
    assert 0.75 < share0 < 0.97


def test_nan_scores_never_selected():
    il = ItemList(item_ids=[1, 2, 3], scores=np.array([1.0, np.nan, 2.0], dtype=np.float32))
    for seed in range(20):
        out = stochastic_rank(il, 3, seed)
        assert 2 not in out.ids().tolist()


def test_scale_sharpens_distribution():
    """``scale`` multiplies scores (inverse temperature): larger scale makes
    the top item win more often; small scale approaches uniform."""
    il = scored([3.0, 0.0])
    sharp = np.mean([int(stochastic_rank(il, 1, s, scale=10.0).ids()[0]) == 0 for s in range(200)])
    flat = np.mean([int(stochastic_rank(il, 1, s, scale=0.1).ids()[0]) == 0 for s in range(200)])
    assert sharp > 0.95
    assert 0.4 < flat < 0.75
    assert sharp > flat


def test_state_checkpoint_roundtrip(tmp_path, ml_ds):
    """ParameterContainer NPZ checkpointing round-trips ALS factors
    (reference: state/_container.py:14)."""
    from lkpy_tpu.models.als import ImplicitMFScorer
    from lkpy_tpu.state import load_parameters, save_parameters
    from lkpy_tpu.training import TrainingOptions

    s = ImplicitMFScorer(ImplicitMFScorer.validate_config({"features": 8, "epochs": 2}))
    s.train(ml_ds, TrainingOptions(rng=42))
    save_parameters(s, tmp_path / "ckpt.npz")

    s2 = ImplicitMFScorer(ImplicitMFScorer.validate_config({"features": 8, "epochs": 2}))
    s2.users = s.users
    s2.items = s.items
    load_parameters(s2, tmp_path / "ckpt.npz")
    np.testing.assert_allclose(s2.item_embeddings, s.item_embeddings)
    np.testing.assert_allclose(s2.user_embeddings, s.user_embeddings)


def test_extreme_scales_stay_finite():
    """Overflow stability (reference: tests/stochastic/test_stochastic_ranker.py
    test_overflow): huge score*scale products must not produce NaN/inf keys."""
    for scale in (1e-3, 1.0, 1e6):
        r = StochasticTopNRanker(scale=scale)
        items = ItemList(item_ids=np.arange(50), scores=np.linspace(-1e4, 1e4, 50))
        out = r(items=items)
        assert len(out) == 50
        assert out.ordered
        assert np.isfinite(out.scores()).all()
        # original scores preserved per item
        omap = dict(zip(out.ids().tolist(), out.scores().tolist()))
        imap = dict(zip(items.ids().tolist(), items.scores().tolist()))
        assert omap == imap
