"""Uniform scorer test grid via the shared harness
(reference pattern: tests/models/test_als_explicit.py:28-39 etc.).

Accuracy-gate thresholds (``expected_rmse``/``expected_ndcg``) were
calibrated on ml-latest-small (the bundled dataset; the reference's gates
use ML-100K, which is not shipped here) with ``quick_measure_model``
(rng=42, 50% user sample, 20% holdout, top-20) and cross-checked against
the reference's published ML-100K ranges — see PARITY.md §"Accuracy gates"
for the measured values and the threshold-transfer notes.  Grid tests use
tiny fast configs; the gates use ``eval_config`` (realistic sizes).
"""

from lkpy_tpu.models.als import BiasedMFScorer, ImplicitMFScorer
from lkpy_tpu.models.bias import BiasScorer
from lkpy_tpu.models.ease import EASEScorer
from lkpy_tpu.models.knn import ItemKNNScorer, UserKNNScorer
from lkpy_tpu.testing import BasicComponentTests, ScorerTests


class TestBiasGrid(ScorerTests):
    component = BiasScorer
    # measured RMSE 0.891 (reference gate 0.89-0.99, test_als_explicit.py:30)
    expected_rmse = (0.84, 0.95)


class TestBiasedMFGrid(ScorerTests):
    component = BiasedMFScorer
    config = BiasedMFScorer.validate_config({"features": 16, "epochs": 3})
    eval_config = BiasedMFScorer.validate_config({"features": 32, "epochs": 10})
    # measured RMSE 0.859 (reference gate 0.89-0.99 on ML-100K)
    expected_rmse = (0.80, 0.95)


class TestImplicitMFGrid(ScorerTests):
    component = ImplicitMFScorer
    config = ImplicitMFScorer.validate_config({"features": 16, "epochs": 3})
    eval_config = ImplicitMFScorer.validate_config({"features": 32, "epochs": 10})
    # measured NDCG@20 0.219 (reference gate >= 0.22 on ML-100K;
    # ml-latest-small runs slightly lower for every implementation)
    expected_ndcg = 0.19


class TestItemKNNGrid(ScorerTests):
    component = ItemKNNScorer
    can_score = "some"
    use_dense_gate = True
    # measured RMSE 0.858 / NDCG 0.036 on the ML-100K-density subset
    # (reference gates 0.85-0.95 / >= 0.03, test_knn_item_item.py:65-66)
    expected_rmse = (0.80, 0.95)
    expected_ndcg = 0.03


class TestItemKNNImplicitGrid(ScorerTests):
    component = ItemKNNScorer
    config = ItemKNNScorer.validate_config({"feedback": "implicit"})
    can_score = "some"
    # measured NDCG@20 0.257 (reference gate >= 0.10, test_knn_item_item.py:95)
    expected_ndcg = 0.10


class TestEASEGrid(ScorerTests):
    component = EASEScorer
    can_score = "some"
    grid_dataset = "dense"  # closed-form inverse scales with catalog^2
    # measured NDCG@20 0.264 (reference gate >= 0.01, test_ease.py:44)
    expected_ndcg = 0.10


class TestPopBasic(BasicComponentTests):
    from lkpy_tpu.models.basic import PopScorer

    component = PopScorer


class TestPopGrid(ScorerTests):
    from lkpy_tpu.models.basic import PopScorer

    component = PopScorer
    # measured NDCG@20 0.166 (no reference gate; popularity sanity floor)
    expected_ndcg = 0.10


class TestUserKNNGrid(ScorerTests):
    from lkpy_tpu.models.knn import UserKNNScorer

    component = UserKNNScorer
    can_score = "some"
    use_dense_gate = True
    # measured RMSE 0.863 / NDCG 0.060 on the dense subset
    # (reference gates 0.855-0.965 / >= 0.03, test_knn_user_user.py:37,79)
    expected_rmse = (0.80, 0.97)
    expected_ndcg = 0.03


class TestUserKNNImplicitGrid(ScorerTests):
    component = UserKNNScorer
    config = UserKNNScorer.validate_config({"feedback": "implicit"})
    can_score = "some"
    # measured NDCG@20 0.315 (reference gate >= 0.03)
    expected_ndcg = 0.10


class TestSLIMGrid(ScorerTests):
    from lkpy_tpu.models.slim import SLIMScorer

    component = SLIMScorer
    can_score = "some"
    grid_dataset = "dense"  # FISTA cost scales with catalog^2; full ml_ds took 380s
    use_dense_gate = True  # measured 0.348 on dense in 9s vs 0.342 in 148s on full
    # measured NDCG@20 0.348 dense / 0.342 full (reference gate 0.2-0.4, test_slim.py:37)
    expected_ndcg = 0.20


class TestAssociationGrid(ScorerTests):
    from lkpy_tpu.models.association import AssociationScorer

    component = AssociationScorer
    can_score = "some"
    grid_dataset = "dense"
    # measured NDCG@20 0.237 (reference gate >= 0.01, test_association.py:15)
    expected_ndcg = 0.10


class TestFunkSVDGrid(ScorerTests):
    from lkpy_tpu.models.funksvd import FunkSVDScorer

    component = FunkSVDScorer
    config = FunkSVDScorer.validate_config({"features": 8, "epochs": 5})
    eval_config = FunkSVDScorer.validate_config({"features": 32, "epochs": 30})
    # measured RMSE 0.881 (reference gate 0.87-0.97, test_funksvd.py:33)
    expected_rmse = (0.82, 0.97)


class TestFlexMFExplicitGrid(ScorerTests):
    from lkpy_tpu.models.flexmf import FlexMFExplicitScorer

    component = FlexMFExplicitScorer
    config = FlexMFExplicitScorer.validate_config({"features": 8, "epochs": 2})
    eval_config = FlexMFExplicitScorer.validate_config({"features": 32, "epochs": 10})
    # measured RMSE 0.870 (reference gate 0.96 +/- 0.05, test_flexmf_explicit.py:15)
    expected_rmse = (0.80, 1.01)


class TestFlexMFLogisticGrid(ScorerTests):
    from lkpy_tpu.models.flexmf import FlexMFImplicitScorer

    component = FlexMFImplicitScorer
    config = FlexMFImplicitScorer.validate_config({"features": 8, "epochs": 2})
    eval_config = FlexMFImplicitScorer.validate_config({"features": 32, "epochs": 10})
    # measured NDCG@20 0.217 (reference gate 0.01-0.25, test_flexmf_implicit.py:16)
    expected_ndcg = 0.15


class TestFlexMFBPRGrid(ScorerTests):
    from lkpy_tpu.models.flexmf import FlexMFImplicitScorer

    component = FlexMFImplicitScorer
    config = FlexMFImplicitScorer.validate_config({"preset": "bpr", "features": 8, "epochs": 2})
    eval_config = FlexMFImplicitScorer.validate_config({"preset": "bpr", "features": 32, "epochs": 10})
    # measured NDCG@20 0.219 (reference gate 0.01-0.25)
    expected_ndcg = 0.15


class TestFlexMFWARPGrid(ScorerTests):
    from lkpy_tpu.models.flexmf import FlexMFImplicitScorer

    component = FlexMFImplicitScorer
    config = FlexMFImplicitScorer.validate_config({"preset": "warp", "features": 8, "epochs": 2})
    eval_config = FlexMFImplicitScorer.validate_config({"preset": "warp", "features": 32, "epochs": 10})
    # measured NDCG@20 0.304 (reference gate 0.01-0.25)
    expected_ndcg = 0.18


class TestLightGCNGrid(ScorerTests):
    from lkpy_tpu.models.lightgcn import LightGCNScorer

    component = LightGCNScorer
    config = LightGCNScorer.validate_config({"features": 8, "epochs": 2})
    eval_config = LightGCNScorer.validate_config({"features": 32, "epochs": 10})
    # measured NDCG@20 0.215 (no reference gate; LightGCN has no accuracy
    # test in the reference suite)
    expected_ndcg = 0.15


class TestBiasedSVDGrid(ScorerTests):
    from lkpy_tpu.models.svd import BiasedSVDScorer

    component = BiasedSVDScorer
    config = BiasedSVDScorer.validate_config({"features": 8})
    eval_config = BiasedSVDScorer.validate_config({"features": 32})
    # measured RMSE 0.871 (reference gate 0.915-0.925, test_svd.py:32)
    expected_rmse = (0.80, 0.95)


class TestNMFGrid(ScorerTests):
    from lkpy_tpu.models.nmf import NMFScorer

    component = NMFScorer
    config = NMFScorer.validate_config({"features": 8})
    eval_config = NMFScorer.validate_config({"features": 32})
    can_score = "some"
    # measured NDCG@20 0.299 (reference gate >= 0.22, test_nmf.py:31)
    expected_ndcg = 0.20


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
