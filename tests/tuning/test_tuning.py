import numpy as np
import pytest

from lkpy_tpu.splitting import SampleFrac, sample_users
from lkpy_tpu.tuning import ParamSpace, PipelineTuner, PlateauStopRule, TuningSpec


def test_plateau_rule():
    rule = PlateauStopRule(patience=2, maximize=True)
    assert not rule.update(0.1)
    assert not rule.update(0.2)
    assert not rule.update(0.2)  # stale 1
    assert rule.update(0.19)  # stale 2 -> stop


def test_param_space_sampling():
    rng = np.random.default_rng(42)
    s = ParamSpace(type="int", min=8, max=64)
    vals = [s.sample(rng) for _ in range(20)]
    assert all(8 <= v <= 64 for v in vals)
    assert all(isinstance(v, int) for v in vals)
    c = ParamSpace(type="categorical", choices=["a", "b"])
    assert c.sample(rng) in ("a", "b")
    lg = ParamSpace(type="float", min=1e-4, max=1.0, log=True)
    lv = [lg.sample(rng) for _ in range(50)]
    assert min(lv) < 0.01 and max(lv) > 0.05


@pytest.mark.slow
def test_random_search_bias(ml_ds):
    split = sample_users(ml_ds, 60, SampleFrac(0.2, rng=42), rng=42)
    spec = TuningSpec(
        model="bias",
        space={"damping": ParamSpace(type="float", min=0.1, max=50.0, log=True)},
        metric="RMSE",
        mode="minimize",
        max_points=4,
        predicts_ratings=True,
    )
    tuner = PipelineTuner(spec, split, rng=42)
    res = tuner.run()
    assert len(res.points) == 4
    assert 0.1 <= res.best_params["damping"] <= 50.0
    assert res.best_value == min(p.value for p in res.points)
    df = res.to_df()
    assert len(df) == 4


@pytest.mark.slow
def test_iterative_search_als(ml_ds):
    split = sample_users(ml_ds, 60, SampleFrac(0.2, rng=42), rng=42)
    spec = TuningSpec(
        model="als-implicit",
        space={"embedding_size": ParamSpace(type="int", min=8, max=32)},
        fixed={"epochs": 10},
        metric="NDCG@20",
        mode="maximize",
        max_points=2,
        method="iterative",
        max_epochs=6,
    )
    tuner = PipelineTuner(spec, split, rng=42)
    res = tuner.run()
    assert len(res.points) == 2
    assert all(p.epochs is not None and p.epochs <= 6 for p in res.points)
    assert res.best_value > 0


def test_tpe_beats_random_quadratic():
    """The TPE sampler must find better points than random search on a
    seeded smooth objective with the same budget (VERDICT r1 item 7)."""
    from lkpy_tpu.tuning.sampler import RandomSampler, TPESampler

    space = {
        "x": ParamSpace(type="float", min=0.0, max=1.0),
        "y": ParamSpace(type="float", min=0.0, max=1.0),
    }

    def objective(p):
        return -((p["x"] - 0.7) ** 2) - (p["y"] - 0.3) ** 2

    def run(sampler_cls, seed, **kw):
        rng = np.random.default_rng(seed)
        sampler = sampler_cls(space, rng, **kw)
        obs = []
        for _ in range(40):
            p = sampler.suggest(obs, [])
            obs.append((p, objective(p)))
        return max(v for _, v in obs)

    tpe = np.mean([run(TPESampler, s, n_startup=8) for s in range(5)])
    rand = np.mean([run(RandomSampler, s) for s in range(5)])
    assert tpe > rand


def test_tpe_categorical_and_int():
    from lkpy_tpu.tuning.sampler import TPESampler

    space = {
        "k": ParamSpace(type="int", min=4, max=64, log=True),
        "mode": ParamSpace(type="categorical", choices=["a", "b", "c"]),
    }

    def objective(p):
        return (1.0 if p["mode"] == "b" else 0.0) - abs(p["k"] - 32) / 64

    rng = np.random.default_rng(0)
    sampler = TPESampler(space, rng, n_startup=6)
    obs = []
    for _ in range(30):
        p = sampler.suggest(obs, [])
        assert 4 <= p["k"] <= 64 and isinstance(p["k"], int)
        assert p["mode"] in ("a", "b", "c")
        obs.append((p, objective(p)))
    best = max(obs, key=lambda o: o[1])[0]
    assert best["mode"] == "b"


def test_concurrent_trials_overlap(ml_ds, monkeypatch):
    """n_concurrent > 1 must actually overlap trial evaluations."""
    import threading
    import time as _time

    from lkpy_tpu.splitting import SampleFrac, sample_users
    from lkpy_tpu.tuning.search import PipelineTuner, SearchPoint

    split = sample_users(ml_ds, 20, SampleFrac(0.2, rng=42), rng=42)
    spec = TuningSpec(
        model="bias",
        space={"damping": ParamSpace(type="float", min=0.1, max=50.0)},
        max_points=6,
        n_concurrent=3,
        sampler="random",
    )
    tuner = PipelineTuner(spec, split, rng=42)

    active = 0
    peak = 0
    lock = threading.Lock()

    def fake_trial(params):
        nonlocal active, peak
        with lock:
            active += 1
            peak = max(peak, active)
        _time.sleep(0.1)
        with lock:
            active -= 1
        return SearchPoint(params, -abs(params["damping"] - 5.0))

    monkeypatch.setattr(tuner, "_run_trial", fake_trial)
    res = tuner.run()
    assert len(res.points) == 6
    assert peak >= 2, f"trials never overlapped (peak concurrency {peak})"
