"""
Parameter serialization for checkpoint/resume.

Capability parity with the reference ``ParameterContainer``
(reference: src/lenskit/state/_container.py:14) — the
``get_parameters``/``load_parameters`` protocol implemented by ALS and
FlexMF trainers and scorers — plus native checkpoint files (compressed NPZ;
the reference points at safetensors/zarr-style storage).
"""

from __future__ import annotations

from os import PathLike
from pathlib import Path
from typing import Protocol, runtime_checkable

import numpy as np

__all__ = ["ParameterContainer", "save_parameters", "load_parameters"]


@runtime_checkable
class ParameterContainer(Protocol):  # pragma: no cover - protocol
    """Objects whose learned parameters can be extracted and restored."""

    def get_parameters(self) -> dict[str, object]: ...

    def load_parameters(self, state: dict[str, object]) -> None: ...


def save_parameters(obj: ParameterContainer, path: str | PathLike) -> None:
    """Checkpoint an object's parameters to a compressed .npz file."""
    state = obj.get_parameters()
    arrays = {}
    for k, v in state.items():
        if v is None:
            continue
        arrays[k] = np.asarray(v)
    np.savez_compressed(Path(path), **arrays)


def load_parameters(obj: ParameterContainer, path: str | PathLike) -> None:
    """Restore parameters checkpointed with :func:`save_parameters`."""
    with np.load(Path(path)) as data:
        state = {k: data[k] for k in data.files}
    obj.load_parameters(state)
