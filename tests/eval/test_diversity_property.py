"""Diversity/exposure metric property tests: entropy, Gini, and ILS against
numpy oracles over random lists (reference: _entropy.py, _gini.py, _ils.py)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lkpy_tpu.data import ItemList, ItemListCollection, Vocabulary
from lkpy_tpu.metrics.ranking import ILS, Entropy, ExposureGini, ListGini, RankBiasedEntropy

FAST = settings(max_examples=30, deadline=None)

N_ITEMS = 25


@st.composite
def runs(draw, max_lists=6):
    n = draw(st.integers(1, max_lists))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    ilc = ItemListCollection(["user_id"])
    for u in range(n):
        k = rng.integers(1, 10)
        ids = rng.choice(N_ITEMS, size=k, replace=False) + 1
        ilc.add(ItemList(item_ids=ids.astype(np.int64), ordered=True), u)
    return ilc


def gini_oracle(x):
    x = np.sort(np.asarray(x, np.float64))
    n = len(x)
    if x.sum() == 0:
        return 0.0
    cum = np.cumsum(x)
    return float((n + 1 - 2 * (cum / cum[-1]).sum()) / n)


@FAST
@given(runs())
def test_list_gini_matches_oracle(ilc):
    vocab = Vocabulary(np.arange(1, N_ITEMS + 1))
    got = ListGini(items=vocab).measure_run(ilc, ilc)
    exp = np.zeros(N_ITEMS)
    for _k, il in ilc.items():
        for i in il.ids():
            exp[i - 1] += 1
    np.testing.assert_allclose(got, gini_oracle(exp), atol=1e-9)
    assert 0.0 <= got <= 1.0


@FAST
@given(runs())
def test_exposure_gini_bounded_and_ge_uniform(ilc):
    vocab = Vocabulary(np.arange(1, N_ITEMS + 1))
    g = ExposureGini(items=vocab).measure_run(ilc, ilc)
    assert 0.0 <= g <= 1.0


@FAST
@given(runs())
def test_identity_entropy_is_log_count(ilc):
    for _k, il in ilc.items():
        e = Entropy().measure_list(il, il)
        np.testing.assert_allclose(e, np.log2(len(il)))


@FAST
@given(runs())
def test_rank_biased_entropy_le_uniform(ilc):
    """Geometric rank weighting concentrates exposure, so RBE over item
    identity is at most the uniform (unweighted) entropy."""
    for _k, il in ilc.items():
        rbe = RankBiasedEntropy().measure_list(il, il)
        uni = Entropy().measure_list(il, il)
        assert rbe <= uni + 1e-9


@FAST
@given(runs(), st.integers(0, 2**31 - 1))
def test_ils_matches_pairwise_cosine(ilc, seed):
    rng = np.random.default_rng(seed)
    for _k, il in ilc.items():
        if len(il) < 2:
            continue
        vecs = rng.standard_normal((len(il), 4)).astype(np.float32)
        il2 = ItemList(il, vector=list(vecs))
        got = ILS(field="vector").measure_list(il2, il2)
        unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = unit @ unit.T
        want = sims[np.triu_indices(len(il), k=1)].mean()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        assert -1.0 - 1e-9 <= got <= 1.0 + 1e-9
