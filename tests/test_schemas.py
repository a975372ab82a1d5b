"""Format-dispatched schema loading (reference: src/lenskit/schemas/_load.py)."""

import json

import pytest

from lkpy_tpu.pipeline.config import PipelineConfig, hash_config
from lkpy_tpu.schemas import dump_model_data, load_model_data

CFG = {
    "meta": {"name": "demo"},
    "inputs": [{"name": "query", "required": True}],
    "components": {
        "scorer": {"code": "lkpy_tpu.models.bias:BiasScorer", "config": {"damping": 5.0}, "inputs": {"query": "query"}}
    },
}


@pytest.mark.parametrize("suffix", [".json", ".toml", ".yaml"])
def test_round_trip(tmp_path, suffix):
    path = tmp_path / f"pipe{suffix}"
    dump_model_data(PipelineConfig.model_validate(CFG), path)
    loaded = load_model_data(path, PipelineConfig)
    assert loaded.meta.name == "demo"
    assert loaded.components["scorer"].config["damping"] == 5.0
    assert loaded.components["scorer"].inputs == {"query": "query"}
    # the content hash must be identical across serialization formats
    assert hash_config(loaded) == hash_config(PipelineConfig.model_validate(CFG))


def test_plain_data(tmp_path):
    path = tmp_path / "raw.json"
    path.write_text(json.dumps({"a": [1, 2]}))
    assert load_model_data(path) == {"a": [1, 2]}


def test_unknown_suffix(tmp_path):
    path = tmp_path / "cfg.ini"
    path.write_text("x")
    with pytest.raises(ValueError, match="unsupported"):
        load_model_data(path)
    with pytest.raises(ValueError, match="unsupported"):
        dump_model_data({}, path)


def test_toml_values(tmp_path):
    path = tmp_path / "vals.toml"
    dump_model_data(
        {"s": "str", "i": 3, "f": 1.5, "b": True, "lst": [1, 2], "tbl": {"nested": {"x": 0}}},
        path,
    )
    data = load_model_data(path)
    assert data == {"s": "str", "i": 3, "f": 1.5, "b": True, "lst": [1, 2], "tbl": {"nested": {"x": 0}}}
