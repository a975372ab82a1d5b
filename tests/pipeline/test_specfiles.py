"""
The shipped pipeline library (pipelines/*.toml).

The reference ships ready-made pipeline + search configs
(reference: pipelines/als-implicit.toml:1, als-implicit-search.toml:1);
these tests load EVERY shipped file, build the pipelines, and sample the
search spaces, so a stale class path or bad space dimension fails CI.
"""

from pathlib import Path

import numpy as np
import pytest

from lkpy_tpu.pipeline.specfile import is_search_file, load_pipeline_file, load_search_file

PIPE_DIR = Path(__file__).parent.parent.parent / "pipelines"
ALL_FILES = sorted(PIPE_DIR.glob("*.toml"))
PIPE_FILES = [p for p in ALL_FILES if not is_search_file(p)]
SEARCH_FILES = [p for p in ALL_FILES if is_search_file(p)]


def test_library_is_complete():
    """17 configs, mirroring the reference's pipelines/ directory."""
    assert len(ALL_FILES) == 17
    assert len(SEARCH_FILES) == 7


@pytest.mark.parametrize("path", PIPE_FILES, ids=lambda p: p.stem)
def test_pipeline_file_builds(path):
    spec = load_pipeline_file(path)
    pipe = spec.build()
    assert pipe.node("scorer") is not None
    if spec.predicts_ratings:
        assert pipe.node("rating-predictor") is not None  # alias on the score path


@pytest.mark.parametrize("path", SEARCH_FILES, ids=lambda p: p.stem)
def test_search_file_loads_and_samples(path):
    spec = load_search_file(path)
    assert spec.space, "search file must define a space"
    rng = np.random.default_rng(42)
    params = {k: ps.sample(rng) for k, ps in spec.space.items()}
    # every sampled point must produce a constructible scorer
    from lkpy_tpu.cli.common import resolve_model
    from lkpy_tpu.tuning.search import _unflatten

    cfg = dict(spec.fixed)
    cfg.update(params)
    scorer = resolve_model(spec.model, _unflatten(cfg))
    assert scorer is not None


def test_pow2_scale_round_trips():
    spec = load_search_file(PIPE_DIR / "als-implicit-search.toml")
    ps = spec.space["embedding_size"]
    assert ps.choices == [8, 16, 32, 64, 128, 256]
    assert spec.metric == "RBP@1000"
    assert spec.fixed == {"user_embeddings": True}


def test_iterative_method_from_max_epochs():
    spec = load_search_file(PIPE_DIR / "flexmf-bpr-search.toml")
    assert spec.method == "iterative"
    assert spec.max_epochs == 50


def test_embedded_pipeline_tables():
    spec = load_search_file(PIPE_DIR / "bias-search.toml")
    assert spec.metric == "RMSE"
    assert spec.mode == "minimize"
    assert spec.predicts_ratings
    assert set(spec.space) == {"damping.user", "damping.item"}
