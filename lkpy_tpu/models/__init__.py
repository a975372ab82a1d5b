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
from lkpy_tpu.models.bias import BiasConfig, BiasModel, BiasScorer

__all__ = [
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
