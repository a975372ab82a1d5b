"""
TPE sampler behavior tests (VERDICT r2 #9; reference analog: the Optuna
TPESampler backend, tuning/_optuna/search.py:40 — here tested directly
against the native implementation).
"""

import numpy as np
import pytest

from lkpy_tpu.tuning.sampler import RandomSampler, TPESampler
from lkpy_tpu.tuning.spec import ParamSpace


def space_1d(log=False):
    return {"x": ParamSpace(type="float", min=0.0 if not log else 1e-3, max=1.0, log=log)}


def test_startup_is_random_within_bounds():
    sp = space_1d()
    s = TPESampler(sp, np.random.default_rng(0), n_startup=5)
    for _ in range(5):
        p = s.suggest([], [])
        assert 0.0 <= p["x"] <= 1.0


def test_tpe_concentrates_on_good_region():
    """After observations with a clear optimum near 0.2, TPE proposals must
    concentrate around it vs uniform random."""
    rng = np.random.default_rng(42)
    sp = space_1d()
    s = TPESampler(sp, rng, n_startup=5)

    def objective(x):
        return -((x - 0.2) ** 2)

    observed = []
    xr = np.linspace(0.0, 1.0, 30)
    for x in xr:
        observed.append(({"x": float(x)}, objective(float(x))))
    props = np.array([s.suggest(observed, [])["x"] for _ in range(40)])
    # majority of proposals land near the optimum
    assert np.mean(np.abs(props - 0.2) < 0.2) > 0.6
    # and they beat uniform sampling's concentration
    r = RandomSampler(sp, np.random.default_rng(0))
    rand = np.array([r.suggest([], [])["x"] for _ in range(40)])
    assert np.mean(np.abs(props - 0.2) < 0.2) > np.mean(np.abs(rand - 0.2) < 0.2)


def test_tpe_minimize_direction():
    rng = np.random.default_rng(1)
    sp = space_1d()
    s = TPESampler(sp, rng, n_startup=5, maximize=False)
    observed = [({"x": float(x)}, (x - 0.8) ** 2) for x in np.linspace(0, 1, 30)]
    props = np.array([s.suggest(observed, [])["x"] for _ in range(40)])
    assert np.mean(np.abs(props - 0.8) < 0.2) > 0.5


def test_constant_liar_spreads_pending():
    """A pending trial at the optimum pushes new proposals away from it."""
    rng = np.random.default_rng(7)
    sp = space_1d()
    s = TPESampler(sp, rng, n_startup=5, n_candidates=48)
    observed = [({"x": float(x)}, -((x - 0.5) ** 2)) for x in np.linspace(0, 1, 20)]
    free = np.array([s.suggest(observed, [])["x"] for _ in range(30)])
    pend = [{"x": 0.5}] * 8
    withp = np.array([s.suggest(observed, pend)["x"] for _ in range(30)])
    # with the liar, proposals sit farther from the pending point on average
    assert np.mean(np.abs(withp - 0.5)) > np.mean(np.abs(free - 0.5)) * 0.99


def test_log_dimension_round_trip():
    sp = {"lr": ParamSpace(type="float", min=1e-4, max=1.0, log=True)}
    s = TPESampler(sp, np.random.default_rng(3), n_startup=2)
    observed = [({"lr": 10.0 ** -k}, -abs(k - 2)) for k in range(5)]
    for _ in range(10):
        p = s.suggest(observed, [])
        assert 1e-4 <= p["lr"] <= 1.0


def test_int_dimension_returns_ints():
    sp = {"k": ParamSpace(type="int", min=4, max=64)}
    s = TPESampler(sp, np.random.default_rng(3), n_startup=2)
    observed = [({"k": int(k)}, -abs(k - 32)) for k in range(4, 64, 4)]
    for _ in range(10):
        p = s.suggest(observed, [])
        assert isinstance(p["k"], int)
        assert 4 <= p["k"] <= 64


def test_categorical_dimension():
    sp = {"loss": ParamSpace(type="categorical", choices=["a", "b", "c"])}
    s = TPESampler(sp, np.random.default_rng(3), n_startup=3)
    # "b" is clearly best
    observed = [({"loss": c}, 1.0 if c == "b" else 0.0) for c in ["a", "b", "c"] * 5]
    props = [s.suggest(observed, [])["loss"] for _ in range(20)]
    assert props.count("b") > 10
