"""
TPU compute kernels: the replacement for the reference's Rust ``_accel`` crate
(reference: src/accel/ — see SURVEY.md §2.2).

Everything here is jit-compatible JAX (+ Pallas for the hot paths): static
shapes, batched/tiled array programs, masked padding instead of ragged loops.
"""

from lkpy_tpu.ops.segment import segment_count, segment_mean, segment_sum
from lkpy_tpu.ops.sparse import DeviceCOO, PaddedRowMatrix, bucket_rows, pad_rows
from lkpy_tpu.ops.topk import masked_top_k, top_n_indices

__all__ = [
    "DeviceCOO",
    "PaddedRowMatrix",
    "bucket_rows",
    "masked_top_k",
    "pad_rows",
    "segment_count",
    "segment_mean",
    "segment_sum",
    "top_n_indices",
]
