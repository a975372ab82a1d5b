"""TrainingTests base exercised on a concrete component
(reference: testing/_components.py:74)."""

from lkpy_tpu.models.bias import BiasScorer
from lkpy_tpu.testing import TrainingTests


class TestBiasTraining(TrainingTests):
    component = BiasScorer
