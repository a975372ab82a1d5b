"""Uniform scorer test grid via the shared harness
(reference pattern: tests/models/test_als_explicit.py:28-39 etc.)."""

from lkpy_tpu.models.als import BiasedMFScorer, ImplicitMFScorer
from lkpy_tpu.models.bias import BiasScorer
from lkpy_tpu.models.ease import EASEScorer
from lkpy_tpu.models.knn import ItemKNNScorer
from lkpy_tpu.testing import BasicComponentTests, ScorerTests


class TestBiasGrid(ScorerTests):
    component = BiasScorer
    expected_rmse = (0.8, 1.05)


class TestBiasedMFGrid(ScorerTests):
    component = BiasedMFScorer
    config = BiasedMFScorer.validate_config({"features": 16, "epochs": 3})


class TestImplicitMFGrid(ScorerTests):
    component = ImplicitMFScorer
    config = ImplicitMFScorer.validate_config({"features": 16, "epochs": 3})


class TestItemKNNGrid(ScorerTests):
    component = ItemKNNScorer
    can_score = "some"


class TestEASEGrid(ScorerTests):
    component = EASEScorer
    can_score = "some"


class TestPopBasic(BasicComponentTests):
    from lkpy_tpu.models.basic import PopScorer

    component = PopScorer
