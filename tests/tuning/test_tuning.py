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
