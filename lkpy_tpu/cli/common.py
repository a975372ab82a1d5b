"""Shared CLI helpers."""

from __future__ import annotations

import json
from importlib import import_module
from pathlib import Path

from lkpy_tpu.data import Dataset, load_movielens

# model registry: short names -> scorer class paths (the reference resolves
# components from pipeline config files; we also offer shorthand)
MODEL_REGISTRY = {
    "bias": "lkpy_tpu.models.bias:BiasScorer",
    "pop": "lkpy_tpu.models.basic:PopScorer",
    "als-biased": "lkpy_tpu.models.als:BiasedMFScorer",
    "als-implicit": "lkpy_tpu.models.als:ImplicitMFScorer",
    "item-knn": "lkpy_tpu.models.knn:ItemKNNScorer",
    "user-knn": "lkpy_tpu.models.knn:UserKNNScorer",
    "ease": "lkpy_tpu.models.ease:EASEScorer",
    "slim": "lkpy_tpu.models.slim:SLIMScorer",
    "association": "lkpy_tpu.models.association:AssociationScorer",
    "funksvd": "lkpy_tpu.models.funksvd:FunkSVDScorer",
    "flexmf-explicit": "lkpy_tpu.models.flexmf:FlexMFExplicitScorer",
    "flexmf-implicit": "lkpy_tpu.models.flexmf:FlexMFImplicitScorer",
    "lightgcn": "lkpy_tpu.models.lightgcn:LightGCNScorer",
    "biased-svd": "lkpy_tpu.models.svd:BiasedSVDScorer",
    "nmf": "lkpy_tpu.models.nmf:NMFScorer",
}


def resolve_model(spec: str, params: dict | None = None):
    path = MODEL_REGISTRY.get(spec, spec)
    mod_name, _, cls_name = path.partition(":")
    mod = import_module(mod_name)
    cls = getattr(mod, cls_name)
    return cls(cls.validate_config(params or {}))


def load_dataset(path: str | Path) -> Dataset:
    path = Path(path)
    if (path / "schema.json").exists():
        return Dataset.load(path)
    return load_movielens(path)


def parse_params(params: tuple[str, ...]) -> dict:
    out = {}
    for p in params:
        k, _, v = p.partition("=")
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out
