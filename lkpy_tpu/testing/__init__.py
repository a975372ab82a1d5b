"""
Reusable test harness.

Capability parity with reference ``lenskit.testing``
(reference: src/lenskit/testing/_components.py:29 ``BasicComponentTests``,
:110 ``ScorerTests``; MovieLens fixtures _movielens.py:47-125; hypothesis
strategies _arrays.py:25-91).
"""

from lkpy_tpu.testing.components import BasicComponentTests, ScorerTests, TrainingTests
from lkpy_tpu.testing.movielens import ml_test_dir

__all__ = ["BasicComponentTests", "ScorerTests", "TrainingTests", "ml_test_dir"]
