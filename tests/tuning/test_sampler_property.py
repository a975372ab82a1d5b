"""TPE sampler + param-space property tests: proposals stay in bounds,
respect types/scales, and the model phase prefers the good region
(`tuning/sampler.py`, `tuning/spec.py`)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lkpy_tpu.tuning.sampler import TPESampler
from lkpy_tpu.tuning.spec import ParamSpace

FAST = settings(max_examples=30, deadline=None)


@st.composite
def spaces(draw):
    dims = {}
    n = draw(st.integers(1, 4))
    for j in range(n):
        kind = draw(st.sampled_from(["float", "float-log", "int", "pow2", "cat"]))
        if kind == "float":
            lo = draw(st.floats(0.0, 10.0))
            dims[f"p{j}"] = ParamSpace(type="float", min=lo, max=lo + draw(st.floats(0.1, 10.0)))
        elif kind == "float-log":
            lo = draw(st.floats(1e-4, 0.1))
            dims[f"p{j}"] = ParamSpace(type="float", min=lo, max=lo * 100, scale="log")
        elif kind == "int":
            lo = draw(st.integers(0, 50))
            dims[f"p{j}"] = ParamSpace(type="int", min=lo, max=lo + draw(st.integers(1, 50)))
        elif kind == "pow2":
            dims[f"p{j}"] = ParamSpace(type="int", min=8, max=256, scale="pow2")
        else:
            dims[f"p{j}"] = ParamSpace(type="categorical", choices=["a", "b", "c"])
    return dims


def check_in_bounds(space, point):
    for name, dim in space.items():
        v = point[name]
        if dim.choices is not None:
            assert v in dim.choices
        else:
            assert dim.min <= v <= dim.max
            if dim.type == "int":
                assert float(v) == int(v)


@FAST
@given(spaces(), st.integers(0, 2**31 - 1))
def test_random_samples_in_bounds(space, seed):
    rng = np.random.default_rng(seed)
    for _ in range(10):
        for name, dim in space.items():
            check_in_bounds({name: dim}, {name: dim.sample(rng)})


@FAST
@given(spaces(), st.integers(0, 2**31 - 1), st.integers(0, 30))
def test_tpe_proposals_in_bounds(space, seed, n_obs):
    rng = np.random.default_rng(seed)
    s = TPESampler(space, rng, n_startup=5)
    observed = [
        ({k: d.sample(rng) for k, d in space.items()}, float(rng.normal()))
        for _ in range(n_obs)
    ]
    pending = [{k: d.sample(rng) for k, d in space.items()}]
    for _ in range(5):
        point = s.suggest(observed, pending)
        assert set(point) == set(space)
        check_in_bounds(space, point)


def test_tpe_prefers_good_region():
    """With a 1-D objective peaked at x=2, post-startup proposals should
    concentrate near the good region (sanity of the density-ratio rule)."""
    rng = np.random.default_rng(42)
    space = {"x": ParamSpace(type="float", min=0.0, max=10.0)}
    s = TPESampler(space, rng, n_startup=5)
    observed = []
    for _ in range(30):
        p = s.suggest(observed, [])
        observed.append((p, -((p["x"] - 2.0) ** 2)))
    xs = np.array([p["x"] for p, _ in observed])
    # the later (model-driven) half should be closer to 2 than the random start
    assert np.abs(xs[15:] - 2.0).mean() < np.abs(xs[:5] - 2.0).mean() + 1e-9


def test_pow2_scale_generates_powers():
    dim = ParamSpace(type="int", min=8, max=256, scale="pow2")
    assert dim.choices == [8, 16, 32, 64, 128, 256]


@FAST
@given(st.integers(0, 2**31 - 1))
def test_log_scale_spans_orders(seed):
    rng = np.random.default_rng(seed)
    dim = ParamSpace(type="float", min=1e-4, max=1.0, scale="log")
    draws = np.array([dim.sample(rng) for _ in range(200)])
    assert (draws >= 1e-4).all() and (draws <= 1.0).all()
    # log-uniform: roughly a quarter of draws per decade
    frac_low = (draws < 1e-3).mean()
    assert 0.05 < frac_low < 0.5
