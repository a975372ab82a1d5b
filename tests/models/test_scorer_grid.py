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


class TestPopGrid(ScorerTests):
    from lkpy_tpu.models.basic import PopScorer

    component = PopScorer


class TestUserKNNGrid(ScorerTests):
    from lkpy_tpu.models.knn import UserKNNScorer

    component = UserKNNScorer
    can_score = "some"


class TestSLIMGrid(ScorerTests):
    from lkpy_tpu.models.slim import SLIMScorer

    component = SLIMScorer
    can_score = "some"


class TestAssociationGrid(ScorerTests):
    from lkpy_tpu.models.association import AssociationScorer

    component = AssociationScorer
    can_score = "some"


class TestFunkSVDGrid(ScorerTests):
    from lkpy_tpu.models.funksvd import FunkSVDScorer

    component = FunkSVDScorer
    config = FunkSVDScorer.validate_config({"features": 8, "epochs": 5})


class TestFlexMFExplicitGrid(ScorerTests):
    from lkpy_tpu.models.flexmf import FlexMFExplicitScorer

    component = FlexMFExplicitScorer
    config = FlexMFExplicitScorer.validate_config({"features": 8, "epochs": 2})


class TestFlexMFBPRGrid(ScorerTests):
    from lkpy_tpu.models.flexmf import FlexMFImplicitScorer

    component = FlexMFImplicitScorer
    config = FlexMFImplicitScorer.validate_config({"preset": "bpr", "features": 8, "epochs": 2})


class TestFlexMFWARPGrid(ScorerTests):
    from lkpy_tpu.models.flexmf import FlexMFImplicitScorer

    component = FlexMFImplicitScorer
    config = FlexMFImplicitScorer.validate_config({"preset": "warp", "features": 8, "epochs": 2})


class TestLightGCNGrid(ScorerTests):
    from lkpy_tpu.models.lightgcn import LightGCNScorer

    component = LightGCNScorer
    config = LightGCNScorer.validate_config({"features": 8, "epochs": 2})


class TestBiasedSVDGrid(ScorerTests):
    from lkpy_tpu.models.svd import BiasedSVDScorer

    component = BiasedSVDScorer
    config = BiasedSVDScorer.validate_config({"features": 8})


class TestNMFGrid(ScorerTests):
    from lkpy_tpu.models.nmf import NMFScorer

    component = NMFScorer
    config = NMFScorer.validate_config({"features": 8})
    can_score = "some"


class TestTimeBoundedPopBasic(BasicComponentTests):
    from lkpy_tpu.models.basic import TimeBoundedPopScore

    component = TimeBoundedPopScore


class TestTopNBasic(BasicComponentTests):
    from lkpy_tpu.models.basic import TopNRanker

    component = TopNRanker


class TestRandomBasic(BasicComponentTests):
    from lkpy_tpu.models.basic import RandomSelector

    component = RandomSelector


class TestKnownRatingBasic(BasicComponentTests):
    from lkpy_tpu.models.basic import KnownRatingScorer

    component = KnownRatingScorer


class TestStochasticBasic(BasicComponentTests):
    from lkpy_tpu.models.stochastic import StochasticTopNRanker

    component = StochasticTopNRanker


class TestFAIRBasic(BasicComponentTests):
    from lkpy_tpu.models.fair import FAIRReranker

    component = FAIRReranker
    config = FAIRReranker.validate_config({"n": 10})
