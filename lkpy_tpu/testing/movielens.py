"""MovieLens test fixtures (reference: src/lenskit/testing/_movielens.py:47)."""

from __future__ import annotations

from pathlib import Path

ML_CANDIDATES = [
    Path("/root/reference/data/ml-latest-small"),
    Path("data/ml-latest-small"),
]


def ml_test_dir() -> Path:
    for c in ML_CANDIDATES:
        if c.exists():
            return c
    raise FileNotFoundError("no bundled MovieLens test data found")
