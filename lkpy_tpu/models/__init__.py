"""
The lkpy-tpu algorithm zoo.

Capability parity with the reference's component packages
(reference: src/lenskit/{basic,als,knn,flexmf,graphs,funksvd.py,sklearn,
stochastic,reranking} — see SURVEY.md §2.1).
"""

from lkpy_tpu.models.basic import (
    FallbackScorer,
    KnownRatingScorer,
    PopScorer,
    RandomSelector,
    SoftmaxRanker,
    TimeBoundedPopScore,
    TopNRanker,
    TrainingItemsCandidateSelector,
    UserTrainingHistoryLookup,
)
from lkpy_tpu.models.als import BiasedMFScorer, ImplicitMFScorer
from lkpy_tpu.models.association import AssociationScorer
from lkpy_tpu.models.bias import BiasConfig, BiasModel, BiasScorer
from lkpy_tpu.models.ease import EASEScorer
from lkpy_tpu.models.funksvd import FunkSVDScorer
from lkpy_tpu.models.knn import ItemKNNScorer, UserKNNScorer
from lkpy_tpu.models.slim import SLIMScorer
from lkpy_tpu.models.stochastic import StochasticTopNRanker

__all__ = [
    "AssociationScorer",
    "BiasedMFScorer",
    "EASEScorer",
    "FunkSVDScorer",
    "ImplicitMFScorer",
    "ItemKNNScorer",
    "SLIMScorer",
    "StochasticTopNRanker",
    "UserKNNScorer",
    "BiasConfig",
    "BiasModel",
    "BiasScorer",
    "FallbackScorer",
    "KnownRatingScorer",
    "PopScorer",
    "RandomSelector",
    "SoftmaxRanker",
    "TimeBoundedPopScore",
    "TopNRanker",
    "TrainingItemsCandidateSelector",
    "UserTrainingHistoryLookup",
]
