"""
Pipeline cloning and modification semantics
(reference: tests/pipeline/test_pipeline_clone.py, test_modify_pipeline.py).
"""

from __future__ import annotations

import pytest

from lkpy_tpu.pipeline import Pipeline, PipelineBuilder


def _double(x: int) -> int:
    return x * 2


def _add(x: int, y: int) -> int:
    return x + y


def _triple(x: int) -> int:
    return x * 3


def _build_simple() -> Pipeline:
    pb = PipelineBuilder("clone-test", "1.0")
    inp = pb.create_input("x", int)
    d = pb.add_component("double", _double, x=inp)
    pb.add_component("add", _add, x=d, y=inp)
    pb.alias("result", "add")
    return pb.build()


def test_clone_preserves_structure_and_behavior():
    pipe = _build_simple()
    copy = pipe.clone()
    assert copy.run("add", x=5) == 15
    assert pipe.run("add", x=5) == 15
    assert {n.name for n in copy.nodes} == {n.name for n in pipe.nodes}


def test_clone_preserves_aliases():
    pipe = _build_simple()
    copy = pipe.clone()
    assert copy.run("result", x=4) == 12


def test_clone_has_equal_config_hash():
    pipe = _build_simple()
    assert pipe.clone().config_hash() == pipe.config_hash()


def test_clone_is_independent_object():
    pipe = _build_simple()
    copy = pipe.clone()
    assert copy is not pipe
    assert copy.node("double") is not pipe.node("double")


def test_modify_via_builder_round_trip():
    pipe = _build_simple()
    pb = pipe.modify() if hasattr(pipe, "modify") else None
    if pb is None:
        pytest.skip("pipeline has no modify()")
    pb.replace_component("double", _triple, x=pb.node("x"))
    out = pb.build()
    assert out.run("add", x=5) == 20  # 3*5 + 5
    # original untouched
    assert pipe.run("add", x=5) == 15


def test_builder_replace_component_rewires():
    pb = PipelineBuilder()
    inp = pb.create_input("x", int)
    pb.add_component("scale", _double, x=inp)
    pb.replace_component("scale", _triple, x=inp)
    assert pb.build().run("scale", x=4) == 12


def test_use_first_of_skips_missing_optional_input():
    pb = PipelineBuilder()
    x = pb.create_input("x", int)
    opt = pb.create_input("maybe", int, None, required=False)
    pb.add_component("double", _double, x=x)
    pb.use_first_of("pick", opt, pb.node("double"))
    pipe = pb.build()
    # optional input absent -> falls through to the component
    assert pipe.run("pick", x=3) == 6
    # optional input present -> wins
    assert pipe.run("pick", x=3, maybe=99) == 99


def test_validate_rejects_unknown_connection():
    pb = PipelineBuilder()
    pb.create_input("x", int)
    with pytest.raises(Exception):
        pb.add_component("c", _double, x="nonexistent-node")
        pb.validate()


def test_node_missing_none_returns_none():
    pb = PipelineBuilder()
    pb.create_input("x", int)
    assert pb.node("nope", missing="none") is None
    with pytest.raises(Exception):
        pb.node("nope")


def test_runtime_input_typecheck():
    """Typed inputs reject mis-typed runtime values
    (reference: tests/pipeline/test_pipeline_runtime_typecheck.py)."""
    pb = PipelineBuilder()
    msg = pb.create_input("message", str)
    pb.add_component("hello", lambda message: f"Hello, {message}", message=msg)
    pipe = pb.build()
    assert pipe.run("hello", message="world") == "Hello, world"
    with pytest.raises(TypeError, match="expected"):
        pipe.run("hello", message=5)


def test_untyped_input_accepts_anything():
    pb = PipelineBuilder()
    x = pb.create_input("x")
    pb.add_component("echo", lambda x: x, x=x)
    pipe = pb.build()
    assert pipe.run("echo", x=5) == 5
    assert pipe.run("echo", x="s") == "s"
