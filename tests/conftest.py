"""
Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4: sharding must be
testable without a pod) — set up environment BEFORE jax is imported.
"""

import os

#: TPU lane (VERDICT r2 #7): ``LKT_TPU_TESTS=1 pytest -m tpu tests/tpu``
#: leaves the real TPU backend live so the TPU-only branches (compiled
#: Pallas kernels, blocked-solve routing, approx_max_k) run on hardware.
TPU_LANE = os.environ.get("LKT_TPU_TESTS") == "1"

if not TPU_LANE:
    # force CPU with 8 virtual devices for sharding tests.  The axon
    # sitecustomize pre-imports jax and latches JAX_PLATFORMS=axon, so an
    # env default is not enough — override the live config before any
    # backend initializes.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from lkpy_tpu.random import set_global_rng

ML_PATH = "/root/reference/data/ml-latest-small"


@pytest.fixture(scope="session", autouse=True)
def rng_seed():
    # pin global seed (reference: conftest.py:30,64 pins seed 42)
    set_global_rng(42)


@pytest.fixture(scope="session")
def ml_ratings():
    from lkpy_tpu.data.movielens import load_movielens_df

    return load_movielens_df(ML_PATH)


@pytest.fixture(scope="session")
def ml_ds():
    from lkpy_tpu.data.movielens import load_movielens

    return load_movielens(ML_PATH)


@pytest.fixture(scope="session")
def ml_dense_ds(ml_ratings):
    """ml-latest-small restricted to items with >= 20 ratings.

    The reference's accuracy gates were calibrated on ML-100K (1682 items,
    6.3% dense); ml-latest-small has a long tail of 1-2-rating items that
    breaks explicit kNN top-N for ANY implementation.  This subset matches
    ML-100K's density (1303 items), making the published gate thresholds
    transferable.
    """
    from lkpy_tpu.data import from_interactions_df

    counts = ml_ratings.groupby("item_id").size()
    dense = ml_ratings[ml_ratings.item_id.isin(counts[counts >= 20].index)]
    return from_interactions_df(dense)
