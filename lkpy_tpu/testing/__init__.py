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


from contextlib import contextmanager


@contextmanager
def set_env_var(name: str, value: str | None):
    """Temporarily set (or unset, with ``None``) an environment variable
    (reference: testing/__init__.py ``set_env_var``)."""
    import os

    old = os.environ.get(name)
    try:
        if value is None:
            os.environ.pop(name, None)
        else:
            os.environ[name] = value
        yield
    finally:
        if old is None:
            os.environ.pop(name, None)
        else:
            os.environ[name] = old


__all__ += ["set_env_var"]
