import numpy as np
import pytest

from lkpy_tpu.data import ItemList, RecQuery
from lkpy_tpu.diagnostics import PipelineError
from lkpy_tpu.pipeline import Component, Pipeline, PipelineBuilder, topn_pipeline
from pydantic import BaseModel


class AddConfig(BaseModel):
    offset: float = 1.0


class AddScore(Component):
    config: AddConfig

    def __call__(self, items: ItemList) -> ItemList:
        s = items.scores()
        if s is None:
            s = np.zeros(len(items), dtype=np.float32)
        return ItemList(items, scores=s + self.config.offset)


def test_simple_run():
    pb = PipelineBuilder()
    inp = pb.create_input("items", ItemList)
    pb.add_component("add", AddScore(offset=2.0), items=inp)
    pipe = pb.build()
    out = pipe.run("add", items=ItemList(item_ids=[1, 2], scores=[1.0, 2.0]))
    assert out.scores().tolist() == [3.0, 4.0]


def test_missing_input_fails():
    pb = PipelineBuilder()
    inp = pb.create_input("items", ItemList)
    pb.add_component("add", AddScore(), items=inp)
    pipe = pb.build()
    with pytest.raises(PipelineError):
        pipe.run("add")


def test_chain_and_default():
    pb = PipelineBuilder()
    inp = pb.create_input("items", ItemList)
    a = pb.add_component("a", AddScore(offset=1.0), items=inp)
    b = pb.add_component("b", AddScore(offset=10.0), items=a)
    pb.default_component(b)
    pipe = pb.build()
    out = pipe.run(items=ItemList(item_ids=[1], scores=[0.0]))
    assert out.scores().tolist() == [11.0]


def test_fallback():
    pb = PipelineBuilder()
    i1 = pb.create_input("primary", ItemList, type(None), required=False)
    i2 = pb.create_input("backup", ItemList)
    fb = pb.use_first_of("either", i1, i2)
    pb.add_component("add", AddScore(), items=fb)
    pipe = pb.build()
    out = pipe.run("add", backup=ItemList(item_ids=[5], scores=[1.0]))
    assert out.ids().tolist() == [5]
    out = pipe.run("add", primary=ItemList(item_ids=[7], scores=[2.0]), backup=ItemList(item_ids=[5], scores=[1.0]))
    assert out.ids().tolist() == [7]


def test_config_roundtrip():
    pb = PipelineBuilder("test-pipe")
    inp = pb.create_input("items", ItemList)
    pb.add_component("add", AddScore(offset=3.5), items=inp)
    pipe = pb.build()
    cfg = pipe.get_config()
    assert cfg.meta.name == "test-pipe"
    assert cfg.components["add"].config == {"offset": 3.5}

    pipe2 = Pipeline.from_config(cfg)
    out = pipe2.run("add", items=ItemList(item_ids=[1], scores=[0.0]))
    assert out.scores().tolist() == [3.5]
    # hash stability
    assert pipe.config_hash() == pipe2.config_hash()


def test_config_hash_changes():
    def mk(off):
        pb = PipelineBuilder()
        inp = pb.create_input("items", ItemList)
        pb.add_component("add", AddScore(offset=off), items=inp)
        return pb.build()

    assert mk(1.0).config_hash() != mk(2.0).config_hash()
    assert mk(1.0).config_hash() == mk(1.0).config_hash()


def test_cycle_detection():
    pb = PipelineBuilder()
    a = pb.add_component("a", AddScore())
    b = pb.add_component("b", AddScore(), items=a)
    pb.connect(a, items=b)
    with pytest.raises(PipelineError):
        pb.build()


def test_alias():
    pb = PipelineBuilder()
    inp = pb.create_input("items", ItemList)
    pb.add_component("add", AddScore(), items=inp)
    pb.alias("plus", "add")
    pipe = pb.build()
    out = pipe.run("plus", items=ItemList(item_ids=[1], scores=[1.0]))
    assert out.scores().tolist() == [2.0]


def test_component_config_validation():
    c = AddScore.validate_config({"offset": 5})
    assert c.offset == 5.0
    comp = AddScore(c)
    assert comp.dump_config() == {"offset": 5.0}


def test_input_hook():
    pb = PipelineBuilder()
    inp = pb.create_input("items", ItemList)
    pb.add_component("add", AddScore(offset=0.0), items=inp)
    pipe = pb.build()
    seen = []

    def hook(node, iname, value):
        seen.append((node, iname))
        return value

    pipe.add_run_hook("component-input", hook)
    pipe.run("add", items=ItemList(item_ids=[1], scores=[1.0]))
    assert ("add", "items") in seen
