"""
Pipeline hook and diagram semantics (VERDICT r2 #9; reference analog:
tests/pipeline/ hook tests over pipeline/_hooks/__init__.py:53 and
_diagram.py).
"""

import numpy as np
import pytest

from lkpy_tpu.data import ItemList
from lkpy_tpu.pipeline import PipelineBuilder
from lkpy_tpu.pipeline.components import Component
from lkpy_tpu.pipeline.diagram import pipeline_diagram


class AddOne(Component):
    def __call__(self, x: int) -> int:
        return x + 1


class Doubler(Component):
    def __call__(self, x: int) -> int:
        return 2 * x


def chain_pipeline():
    pb = PipelineBuilder("chain")
    x = pb.create_input("x", int)
    a = pb.add_component("add", AddOne(), x=x)
    d = pb.add_component("double", Doubler(), x=a)
    pb.alias("default", d)
    return pb.build()


def test_input_hook_observes_all_component_inputs():
    pipe = chain_pipeline()
    seen = []

    def hook(node, iname, value):
        seen.append((node, iname, value))
        return value

    pipe.add_run_hook("component-input", hook)
    assert pipe.run("double", x=3) == 8
    assert ("add", "x", 3) in seen
    assert ("double", "x", 4) in seen


def test_input_hook_can_replace_values():
    pipe = chain_pipeline()

    def hook(node, iname, value):
        # replace the raw input to the first component only
        if node == "add":
            return 100
        return value

    pipe.add_run_hook("component-input", hook)
    assert pipe.run("double", x=3) == 202


def test_hooks_run_in_registration_order():
    pipe = chain_pipeline()
    order = []
    pipe.add_run_hook("component-input", lambda n, i, v: (order.append("a"), v)[1])
    pipe.add_run_hook("component-input", lambda n, i, v: (order.append("b"), v)[1])
    pipe.run("add", x=0)
    assert order[:2] == ["a", "b"]


def test_unknown_hook_kind_rejected():
    pipe = chain_pipeline()
    with pytest.raises(ValueError, match="unknown hook kind"):
        pipe.add_run_hook("post-output", lambda *a: None)


def test_diagram_contains_nodes_and_edges():
    pipe = chain_pipeline()
    d = pipeline_diagram(pipe)
    assert d.startswith("flowchart TD")
    assert "add" in d and "double" in d
    assert "AddOne" in d  # component class rendered
    assert "-->|x|" in d  # labeled edge
    assert "x[/x/]" in d  # input node shape


def test_diagram_fallback_and_alias():
    pb = PipelineBuilder("fb")
    x = pb.create_input("x", int, type(None), required=False)
    lit = pb.literal(7, name="seven")
    f = pb.use_first_of("first", x, lit)
    a = pb.add_component("add", AddOne(), x=f)
    pb.alias("result", a)
    pipe = pb.build()
    d = pipeline_diagram(pipe)
    assert "first" in d
    assert "-.->" in d  # fallback dotted edges
    assert "alias" in d
    # and the fallback actually works at run time
    assert pipe.run("add") == 8  # x missing -> literal 7 + 1
    assert pipe.run("add", x=1) == 2
