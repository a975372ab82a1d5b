"""
Lazy component inputs (reference: tests/pipeline/test_lazy.py,
src/lenskit/lazy.py): a ``Lazy[T]``-annotated input defers its upstream
node until ``.get()`` is called.
"""

from __future__ import annotations

import numpy as np

from lkpy_tpu.data import ItemList
from lkpy_tpu.lazy import Lazy, LazyValue
from lkpy_tpu.pipeline import PipelineBuilder


def test_lazy_input_not_run_when_unneeded():
    calls = []

    def expensive() -> int:
        calls.append(1)
        return 42

    def pick(x: int, backup: Lazy[int]) -> int:
        return x if x > 0 else backup.get()

    pb = PipelineBuilder()
    x = pb.create_input("x", int)
    b = pb.add_component("backup", expensive)
    pb.add_component("pick", pick, x=x, backup=b)
    pipe = pb.build()
    assert pipe.run("pick", x=5) == 5
    assert calls == []  # backup never ran
    assert pipe.run("pick", x=-1) == 42
    assert calls == [1]


def test_lazy_transitive_chain():
    """Deferral is transitive: the lazy node's own upstream only runs on get."""
    calls = []

    def base() -> int:
        calls.append("base")
        return 10

    def double(v: int) -> int:
        calls.append("double")
        return v * 2

    def pick(x: int, backup: Lazy[int]) -> int:
        return x if x > 0 else backup.get()

    pb = PipelineBuilder()
    x = pb.create_input("x", int)
    b = pb.add_component("base", base)
    d = pb.add_component("double", double, v=b)
    pb.add_component("pick", pick, x=x, backup=d)
    pipe = pb.build()
    assert pipe.run("pick", x=1) == 1
    assert calls == []
    assert pipe.run("pick", x=0) == 20
    assert calls == ["base", "double"]


def test_lazy_value_memoizes():
    calls = []
    lv = LazyValue(lambda: calls.append(1) or 7)
    assert lv.get() == 7
    assert lv.get() == 7
    assert calls == [1]


def test_fallback_scorer_defers_backup():
    """FallbackScorer's backup is Lazy: with no NaNs the backup never runs
    (reference: basic/composite.py FallbackScorer)."""
    from lkpy_tpu.models.basic import FallbackScorer

    calls = []

    def primary() -> ItemList:
        return ItemList(item_ids=[1, 2], scores=[1.0, 2.0])

    def backup() -> ItemList:
        calls.append(1)
        return ItemList(item_ids=[1, 2], scores=[9.0, 9.0])

    pb = PipelineBuilder()
    p = pb.add_component("primary", primary)
    b = pb.add_component("backup", backup)
    pb.add_component("fallback", FallbackScorer(), scores=p, backup=b)
    pipe = pb.build()
    out = pipe.run("fallback")
    assert np.allclose(out.scores(), [1.0, 2.0])
    assert calls == []  # no NaNs -> backup never ran

    def primary_nan() -> ItemList:
        return ItemList(item_ids=[1, 2], scores=[1.0, np.nan])

    pb2 = PipelineBuilder()
    p2 = pb2.add_component("primary", primary_nan)
    b2 = pb2.add_component("backup", backup)
    pb2.add_component("fallback", FallbackScorer(), scores=p2, backup=b2)
    out2 = pb2.build().run("fallback")
    assert np.allclose(out2.scores(), [1.0, 9.0])
    assert calls == [1]


def test_fallback_scorer_accepts_plain_itemlist():
    from lkpy_tpu.models.basic import FallbackScorer

    fs = FallbackScorer()
    out = fs(
        scores=ItemList(item_ids=[1, 2], scores=[np.nan, 2.0]),
        backup=ItemList(item_ids=[1, 2], scores=[5.0, 5.0]),
    )
    assert np.allclose(out.scores(), [5.0, 2.0])
