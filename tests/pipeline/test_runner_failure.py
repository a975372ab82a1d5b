"""Pipeline runner failure and laziness semantics (reference:
pipeline/_runner.py:82-85 failed-node marking; lazy.py deferred inputs)."""

from __future__ import annotations

import numpy as np
import pytest

from lkpy_tpu.lazy import LazyValue
from lkpy_tpu.pipeline import PipelineBuilder


class Boom(Exception):
    pass


def _build(fail_stage: str | None = None):
    pb = PipelineBuilder("failing")
    x = pb.create_input("x", int)

    def first(x: int) -> int:
        if fail_stage == "first":
            raise Boom("first failed")
        return x + 1

    def second(x: int) -> int:
        if fail_stage == "second":
            raise Boom("second failed")
        return x * 10

    n1 = pb.add_component("first", first, x=x)
    n2 = pb.add_component("second", second, x=n1)
    return pb.build(), n2


def test_success_path():
    pipe, out = _build()
    assert pipe.run(out, x=2) == 30


def test_failure_propagates_with_node_context():
    pipe, out = _build("second")
    with pytest.raises(Boom):
        pipe.run(out, x=2)


def test_upstream_failure_stops_downstream():
    calls = []
    pb = PipelineBuilder("order")
    x = pb.create_input("x", int)

    def a(x: int) -> int:
        raise Boom()

    def b(x: int) -> int:
        calls.append("b")
        return x

    n1 = pb.add_component("a", a, x=x)
    n2 = pb.add_component("b", b, x=n1)
    pipe = pb.build()
    with pytest.raises(Boom):
        pipe.run(n2, x=1)
    assert calls == []  # downstream never ran


def test_partial_state_excludes_failed_node():
    pipe, out = _build("second")
    # run_all surfaces the error, not a half-state
    with pytest.raises(Boom):
        pipe.run_all("second", x=2)


def test_missing_input_errors():
    pipe, out = _build()
    with pytest.raises(Exception):
        pipe.run(out)  # x not provided


def test_lazy_value_memoizes():
    calls = []

    def thunk():
        calls.append(1)
        return 42

    lv = LazyValue(thunk)
    assert lv.get() == 42
    assert lv.get() == 42
    assert len(calls) == 1


def test_lazy_value_memoizes_none():
    calls = []
    lv = LazyValue(lambda: calls.append(1))
    assert lv.get() is None
    assert lv.get() is None
    assert len(calls) == 1


def test_hook_sees_failure_inputs_only_up_to_failure():
    seen = []
    pipe, out = _build("second")
    pipe.add_run_hook("component-input", lambda n, i, v: (seen.append((n, i)), v)[1])
    with pytest.raises(Boom):
        pipe.run(out, x=2)
    # the first component's input was observed; nothing after the failure
    assert ("first", "x") in seen
