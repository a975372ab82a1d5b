"""
SPEC-7-style RNG management tests (VERDICT r2 #9; reference analog:
tests for src/lenskit/random.py:30-60 — global seed, derivable per-query
seeds, generator coercion).
"""

import numpy as np
import pytest

from lkpy_tpu.random import (
    derive_seed,
    global_rng_seed,
    int_seed,
    jax_key,
    random_generator,
    set_global_rng,
    spawn_seed,
)


def test_set_global_rng_reproducible():
    set_global_rng(1234)
    a = random_generator().integers(0, 1 << 30, 5)
    set_global_rng(1234)
    b = random_generator().integers(0, 1 << 30, 5)
    np.testing.assert_array_equal(a, b)
    set_global_rng(42)  # restore the suite-wide seed


def test_derive_seed_deterministic_and_key_sensitive():
    s1 = derive_seed("user", 7, base=99)
    s2 = derive_seed("user", 7, base=99)
    s3 = derive_seed("user", 8, base=99)
    g1 = np.random.default_rng(s1).integers(0, 1 << 30, 4)
    g2 = np.random.default_rng(s2).integers(0, 1 << 30, 4)
    g3 = np.random.default_rng(s3).integers(0, 1 << 30, 4)
    np.testing.assert_array_equal(g1, g2)
    assert not np.array_equal(g1, g3)


def test_derive_seed_string_keys():
    a = derive_seed("alice", base=5)
    b = derive_seed("bob", base=5)
    assert np.random.default_rng(a).integers(0, 1 << 30) != np.random.default_rng(b).integers(
        0, 1 << 30
    )


def test_spawn_seed_unique():
    set_global_rng(77)
    s1 = spawn_seed()
    s2 = spawn_seed()
    v1 = np.random.default_rng(s1).integers(0, 1 << 30)
    v2 = np.random.default_rng(s2).integers(0, 1 << 30)
    assert v1 != v2
    set_global_rng(42)


def test_random_generator_coercions():
    # int seed
    g = random_generator(5)
    assert isinstance(g, np.random.Generator)
    # pass-through generator
    g2 = random_generator(g)
    assert g2 is g
    # SeedSequence
    g3 = random_generator(np.random.SeedSequence(9))
    assert isinstance(g3, np.random.Generator)


def test_int_seed_stable():
    assert int_seed(123) == int_seed(123)
    assert int_seed(123) != int_seed(124)


def test_jax_key_deterministic():
    import jax

    k1 = jax_key(42)
    k2 = jax_key(42)
    v1 = jax.random.uniform(k1, (3,))
    v2 = jax.random.uniform(k2, (3,))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))


def test_global_seed_visible():
    set_global_rng(2024)
    assert isinstance(global_rng_seed(), np.random.SeedSequence)
    set_global_rng(42)
