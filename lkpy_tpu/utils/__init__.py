"""Small utilities (reference: src/lenskit/util/, src/lenskit/stats.py)."""

from lkpy_tpu.utils.stats import gini

__all__ = ["gini"]
