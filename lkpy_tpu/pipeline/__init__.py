"""
Pipeline abstraction: DAGs of recommendation components.

Capability parity with reference ``lenskit.pipeline``
(reference: src/lenskit/pipeline/__init__.py).
"""

from lkpy_tpu.pipeline.builder import PipelineBuilder
from lkpy_tpu.pipeline.cache import PipelineCache
from lkpy_tpu.pipeline.diagram import pipeline_diagram
from lkpy_tpu.pipeline.profiling import PipelineProfiler, summarize_profile
from lkpy_tpu.pipeline.common import RecPipelineBuilder, predict_pipeline, topn_pipeline
from lkpy_tpu.pipeline.components import Component, component_inputs, component_return_type
from lkpy_tpu.pipeline.config import PipelineConfig, hash_config
from lkpy_tpu.pipeline.nodes import ComponentNode, FallbackNode, InputNode, LiteralNode, Node
from lkpy_tpu.pipeline.pipeline import Pipeline, PipelineState

__all__ = [
    "Component",
    "ComponentNode",
    "FallbackNode",
    "InputNode",
    "LiteralNode",
    "Node",
    "Pipeline",
    "PipelineBuilder",
    "PipelineCache",
    "PipelineConfig",
    "PipelineProfiler",
    "pipeline_diagram",
    "summarize_profile",
    "PipelineState",
    "RecPipelineBuilder",
    "component_inputs",
    "component_return_type",
    "hash_config",
    "predict_pipeline",
    "topn_pipeline",
]
