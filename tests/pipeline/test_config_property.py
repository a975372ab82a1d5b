"""Pipeline config round-trip property tests: every randomly configured
standard pipeline must survive config serialization with a stable hash
(reference semantics: pipeline config round-trip + SHA-256 hashing,
schemas/pipeline.py)."""

from __future__ import annotations

import json

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lkpy_tpu.pipeline import Pipeline, topn_pipeline

FAST = settings(max_examples=20, deadline=None)


@st.composite
def scorer_configs(draw):
    kind = draw(st.sampled_from(["als", "biased", "knn", "bias", "flexmf"]))
    if kind == "als":
        from lkpy_tpu.models.als import ImplicitMFScorer

        cfg = {
            "embedding_size": draw(st.sampled_from([8, 16, 32, 64])),
            "epochs": draw(st.integers(1, 20)),
            "regularization": draw(st.floats(1e-4, 1.0)),
            "weight": draw(st.floats(1.0, 100.0)),
        }
        return ImplicitMFScorer(ImplicitMFScorer.validate_config(cfg))
    if kind == "biased":
        from lkpy_tpu.models.als import BiasedMFScorer

        cfg = {
            "embedding_size": draw(st.sampled_from([8, 32])),
            "damping": draw(st.floats(0.0, 25.0)),
            "user_embeddings": draw(st.sampled_from([True, False, "prefer"])),
        }
        return BiasedMFScorer(BiasedMFScorer.validate_config(cfg))
    if kind == "knn":
        from lkpy_tpu.models.knn import ItemKNNScorer

        cfg = {
            "max_nbrs": draw(st.integers(1, 50)),
            "min_nbrs": draw(st.integers(1, 3)),
            "min_sim": draw(st.floats(1e-7, 0.1)),
            "feedback": draw(st.sampled_from(["explicit", "implicit"])),
        }
        return ItemKNNScorer(ItemKNNScorer.validate_config(cfg))
    if kind == "flexmf":
        from lkpy_tpu.models.flexmf import FlexMFImplicitScorer

        cfg = {
            "embedding_size": draw(st.sampled_from([8, 16])),
            "loss": draw(st.sampled_from(["logistic", "pairwise"])),
            "batch_size": draw(st.sampled_from([1024, 8192])),
        }
        return FlexMFImplicitScorer(FlexMFImplicitScorer.validate_config(cfg))
    from lkpy_tpu.models.bias import BiasScorer

    return BiasScorer(damping=draw(st.floats(0.0, 10.0)))


@FAST
@given(scorer_configs(), st.integers(1, 100))
def test_config_round_trip_and_hash(scorer, n):
    pipe = topn_pipeline(scorer, n=n)
    cfg = pipe.get_config()
    clone = Pipeline.from_config(cfg)
    # same config, same hash
    assert clone.config_hash() == pipe.config_hash()
    # the scorer's config survives exactly
    c1 = pipe.node("scorer").component.config
    c2 = clone.node("scorer").component.config
    assert type(c1) is type(c2)
    if hasattr(c1, "model_dump"):
        assert c1.model_dump() == c2.model_dump()


@FAST
@given(scorer_configs())
def test_config_json_stable(scorer):
    """Serializing the config to JSON and back yields the same hash
    (hashing is over canonical content, not object identity)."""
    pipe = topn_pipeline(scorer, n=10)
    blob = pipe.get_config().model_dump_json()
    clone = Pipeline.from_config(json.loads(blob))
    assert clone.config_hash() == pipe.config_hash()


@FAST
@given(scorer_configs(), scorer_configs())
def test_different_configs_different_hashes(a, b):
    pa = topn_pipeline(a, n=10)
    pb = topn_pipeline(b, n=10)
    same = type(a) is type(b) and getattr(a, "config", None) == getattr(b, "config", None)
    if not same:
        assert pa.config_hash() != pb.config_hash()
