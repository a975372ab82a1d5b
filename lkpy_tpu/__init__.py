"""
lkpy-tpu — a TPU-native recommender-systems framework.

A from-scratch re-design of the LensKit (lkpy) capability surface for TPU
hardware: JAX/XLA/Pallas compute kernels, pjit/shard_map distribution over
device meshes, and a host-side Arrow/NumPy data layer.

Capability parity target: lenskit/lkpy (see SURVEY.md).  This package is NOT
a port — the architecture is array-functional and compiler-first rather than
object-DAG + Rust/rayon.

Public surface mirrors the reference's top-level exports
(reference: src/lenskit/__init__.py).
"""

__version__ = "0.1.0"

from lkpy_tpu.config import ensure_compile_cache as _ensure_compile_cache

_ensure_compile_cache()

from lkpy_tpu.data import Dataset, DatasetBuilder, ItemList, ItemListCollection, RecQuery, Vocabulary
from lkpy_tpu.operations import predict, recommend, score
from lkpy_tpu.pipeline import Component, Pipeline, PipelineBuilder, RecPipelineBuilder, predict_pipeline, topn_pipeline

__all__ = [
    "__version__",
    "Dataset",
    "DatasetBuilder",
    "ItemList",
    "ItemListCollection",
    "RecQuery",
    "Vocabulary",
    "Pipeline",
    "PipelineBuilder",
    "RecPipelineBuilder",
    "Component",
    "predict_pipeline",
    "topn_pipeline",
    "predict",
    "recommend",
    "score",
]
