import numpy as np
import pandas as pd
import pytest

from lkpy_tpu import topn_pipeline
from lkpy_tpu.data import ItemList, RecQuery, from_interactions_df
from lkpy_tpu.models.bias import BiasScorer
from lkpy_tpu.pipeline import PipelineCache, PipelineProfiler, pipeline_diagram, summarize_profile
from lkpy_tpu.state import ParameterContainer, load_parameters, save_parameters


@pytest.fixture(scope="module")
def ds():
    return from_interactions_df(
        pd.DataFrame({"user_id": [1, 1, 2], "item_id": [10, 20, 10], "rating": [4.0, 3.0, 5.0]})
    )


def test_profiler(tmp_path, ds):
    pipe = topn_pipeline(BiasScorer(), n=5)
    pipe.train(ds)
    pfile = tmp_path / "profile.csv"
    with PipelineProfiler(pipe, pfile) as prof:
        for uid in (1, 2):
            pipe.run_all("recommender", query=RecQuery(user_id=uid), _profile=prof)
    summary = summarize_profile(pfile)
    assert "scorer" in summary.index
    assert summary.loc["scorer", "runs"] == 2
    assert summary.loc["ranker", "total_s"] >= 0


def test_diagram(ds):
    pipe = topn_pipeline(BiasScorer(), n=5)
    text = pipeline_diagram(pipe)
    assert "flowchart TD" in text
    assert "BiasScorer" in text
    assert "scorer" in text


def test_cache():
    cache = PipelineCache()
    c1 = cache.get_instance(BiasScorer, {"damping": 5.0})
    c2 = cache.get_instance(BiasScorer, {"damping": 5.0})
    c3 = cache.get_instance(BiasScorer, {"damping": 1.0})
    assert c1 is c2
    assert c1 is not c3


def test_state_roundtrip(tmp_path, ml_ds):
    from lkpy_tpu.models.als import ImplicitMFScorer
    from lkpy_tpu.training import TrainingOptions

    s = ImplicitMFScorer(features=8, epochs=2)
    s.train(ml_ds, TrainingOptions(rng=42))
    assert isinstance(s, ParameterContainer)
    f = tmp_path / "ck.npz"
    save_parameters(s, f)
    s2 = ImplicitMFScorer(features=8, epochs=2)
    s2.users = s.users
    s2.items = s.items
    s2._OtOr = s._OtOr
    load_parameters(s2, f)
    items = ItemList(item_ids=[31, 1029])
    np.testing.assert_allclose(
        s2(query=RecQuery(user_id=1), items=items).scores(),
        s(query=RecQuery(user_id=1), items=items).scores(),
    )
