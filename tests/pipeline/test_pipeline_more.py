"""Pipeline behavior tests: training, literals, cloning, run_all, replace
(reference themes: tests/pipeline/test_pipeline.py, test_train.py, test_clone.py)."""

import pickle

import numpy as np
import pytest
from pydantic import BaseModel

from lkpy_tpu.data import ItemList
from lkpy_tpu.diagnostics import PipelineError
from lkpy_tpu.pipeline import Component, Pipeline, PipelineBuilder
from lkpy_tpu.training import Trainable, TrainingOptions


class ShiftConfig(BaseModel):
    offset: float = 1.0


class Shift(Component):
    config: ShiftConfig

    def __call__(self, items: ItemList) -> ItemList:
        s = items.scores()
        if s is None:
            s = np.zeros(len(items), dtype=np.float32)
        return ItemList(items, scores=s + self.config.offset)


class CountingTrainable(Component, Trainable):
    config: ShiftConfig

    def __init__(self, config=None, **kwargs):
        super().__init__(config, **kwargs)
        self.train_count = 0

    @property
    def is_trained(self) -> bool:
        return self.train_count > 0

    def train(self, data, options=None):
        self.train_count += 1

    def __call__(self, items: ItemList) -> ItemList:
        return items


def _mini_pipe(comp):
    pb = PipelineBuilder()
    inp = pb.create_input("items", ItemList)
    pb.add_component("c", comp, items=inp)
    return pb.build()


def test_train_calls_trainables():
    comp = CountingTrainable()
    pipe = _mini_pipe(comp)
    pipe.train(object())
    assert comp.train_count == 1


def test_train_skip_retrain():
    comp = CountingTrainable()
    pipe = _mini_pipe(comp)
    pipe.train(object())
    pipe.train(object(), TrainingOptions(retrain=False))
    assert comp.train_count == 1  # second train skipped (already trained)
    pipe.train(object(), TrainingOptions(retrain=True))
    assert comp.train_count == 2


def test_literal_node():
    pb = PipelineBuilder()
    lit = pb.literal(ItemList(item_ids=[1], scores=[5.0]))
    pb.add_component("add", Shift(offset=1.0), items=lit)
    pipe = pb.build()
    out = pipe.run("add")
    assert out.scores().tolist() == [6.0]


def test_run_all_returns_state():
    pb = PipelineBuilder()
    inp = pb.create_input("items", ItemList)
    a = pb.add_component("a", Shift(offset=1.0), items=inp)
    pb.add_component("b", Shift(offset=2.0), items=a)
    pipe = pb.build()
    state = pipe.run_all("a", "b", items=ItemList(item_ids=[1], scores=[0.0]))
    assert state["a"].scores().tolist() == [1.0]
    assert state["b"].scores().tolist() == [3.0]


def test_replace_component():
    pb = PipelineBuilder()
    inp = pb.create_input("items", ItemList)
    pb.add_component("add", Shift(offset=1.0), items=inp)
    pb.replace_component("add", Shift(offset=42.0), items=inp)
    pipe = pb.build()
    out = pipe.run("add", items=ItemList(item_ids=[1], scores=[0.0]))
    assert out.scores().tolist() == [42.0]


def test_builder_clone_independent():
    pb = PipelineBuilder()
    inp = pb.create_input("items", ItemList)
    pb.add_component("add", Shift(offset=1.0), items=inp)
    pb2 = pb.clone()
    pb2.add_component("extra", Shift(offset=2.0), items=inp)
    p1 = pb.build()
    p2 = pb2.build()
    assert p1.node("extra", missing="none") is None
    assert p2.node("extra", missing="none") is not None


def test_duplicate_node_name_fails():
    pb = PipelineBuilder()
    pb.create_input("items", ItemList)
    pb.add_component("add", Shift(), items="items")
    with pytest.raises((PipelineError, ValueError)):
        pb.add_component("add", Shift(), items="items")


def test_unknown_node_lookup():
    pb = PipelineBuilder()
    pb.create_input("items", ItemList)
    pipe = pb.build()
    with pytest.raises((PipelineError, KeyError)):
        pipe.node("nope")
    assert pipe.node("nope", missing="none") is None


def test_pipeline_pickle_round_trip():
    pb = PipelineBuilder()
    inp = pb.create_input("items", ItemList)
    pb.add_component("add", Shift(offset=3.0), items=inp)
    pipe = pb.build()
    pipe2 = pickle.loads(pickle.dumps(pipe))
    out = pipe2.run("add", items=ItemList(item_ids=[1], scores=[1.0]))
    assert out.scores().tolist() == [4.0]
    assert pipe2.config_hash() == pipe.config_hash()


def test_config_hash_stable_across_instances():
    def build():
        pb = PipelineBuilder()
        inp = pb.create_input("items", ItemList)
        pb.add_component("add", Shift(offset=2.0), items=inp)
        return pb.build()

    assert build().config_hash() == build().config_hash()


def test_component_config_from_kwargs():
    c = Shift(offset=9.0)
    assert c.config.offset == 9.0
    # config object directly
    c2 = Shift(ShiftConfig(offset=4.0))
    assert c2.config.offset == 4.0


def test_component_dump_config():
    c = Shift(offset=2.5)
    cfg = c.dump_config()
    assert cfg == {"offset": 2.5}
