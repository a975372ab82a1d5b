"""
Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4: sharding must be
testable without a pod) — set up environment BEFORE jax is imported.
"""

import os

# force CPU with 8 virtual devices for sharding tests.  The axon sitecustomize
# pre-imports jax and latches JAX_PLATFORMS=axon, so an env default is not
# enough — override the live config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

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
