"""Property tests for the device serving engine (VERDICT r4 #7: a
device-batch property test — random histories, exact top-k oracle).

These drive `serve_batch` / `device_recommend` end-to-end on randomly
generated datasets and check the results against a brute-force numpy
scorer, including history exclusion, ordering, unknown users, and the
plan/grouping invariants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lkpy_tpu.batch.device import device_recommend
from lkpy_tpu.batch.serving import _ladder_width, plan_groups
from lkpy_tpu.data import from_interactions_df
from lkpy_tpu.data.matrix import CSR
from lkpy_tpu.models.als import ImplicitMFScorer
from lkpy_tpu.ops import als as als_ops

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@st.composite
def interaction_sets(draw, max_users=30, max_items=40):
    nu = draw(st.integers(3, max_users))
    ni = draw(st.integers(5, max_items))
    nnz = draw(st.integers(nu, min(nu * ni, 4 * nu)))
    cells = draw(
        st.lists(
            st.tuples(st.integers(0, nu - 1), st.integers(0, ni - 1)),
            min_size=nnz,
            max_size=nnz,
            unique=True,
        )
    )
    # every user needs >=1 interaction so all users exist in the vocab
    cells = list({(u, u % ni) for u in range(nu)} | set(cells))
    users = np.asarray([c[0] for c in cells], dtype=np.int64)
    items = np.asarray([c[1] for c in cells], dtype=np.int64)
    return users, items, nu, ni


def brute_force_topn(scorer, ds, user_ids, n):
    """Numpy oracle: score = u @ i.T, history masked, exact argsort."""
    m = ds.interaction_matrix()
    csr = m.csr(None)
    out = {}
    for uid in user_ids:
        un = ds.users.number(uid, missing="negative")
        if un < 0:
            out[uid] = ([], [])
            continue
        scores = scorer.item_embeddings @ scorer.user_embeddings[un]
        lo, hi = int(csr.rowptr[un]), int(csr.rowptr[un + 1])
        scores = scores.copy()
        scores[csr.colind[lo:hi]] = -np.inf
        order = np.argsort(-scores, kind="stable")[:n]
        keep = scores[order] > -np.inf
        nums = order[keep]
        out[uid] = (list(np.asarray(ds.items.ids)[nums]), list(scores[nums]))
    return out


def make_scorer(ds, k=8, seed=0):
    rng = np.random.default_rng(seed)
    s = ImplicitMFScorer(
        ImplicitMFScorer.validate_config({"features": k, "user_embeddings": "prefer"})
    )
    s.users = ds.users
    s.items = ds.items
    s.user_embeddings = rng.standard_normal((len(ds.users.ids), k)).astype(np.float32)
    s.item_embeddings = rng.standard_normal((len(ds.items.ids), k)).astype(np.float32)
    import jax.numpy as jnp

    s._OtOr = np.asarray(als_ops.implicit_otor(jnp.asarray(s.item_embeddings), jnp.float32(0.1)))
    return s


@SLOW
@given(interaction_sets(), st.integers(1, 12))
def test_device_recommend_matches_bruteforce(data, n):
    users, items, nu, ni = data
    ds = from_interactions_df(pd.DataFrame({"user_id": users, "item_id": items}))
    scorer = make_scorer(ds)
    uids = list(ds.users.ids)
    recs = device_recommend(scorer, uids, n, ds.interaction_matrix(), chunk=4)
    want = brute_force_topn(scorer, ds, uids, n)
    for uid in uids:
        il = recs.lookup(uid)
        wids, wscores = want[uid]
        assert list(il.ids()) == wids, f"user {uid}"
        np.testing.assert_allclose(
            il.scores(), np.asarray(wscores, np.float32), rtol=1e-4, atol=1e-5
        )


@SLOW
@given(interaction_sets())
def test_device_recommend_unknown_and_empty(data):
    users, items, nu, ni = data
    ds = from_interactions_df(pd.DataFrame({"user_id": users, "item_id": items}))
    scorer = make_scorer(ds)
    mixed = [int(ds.users.ids[0]), 999_999_999]
    matrix = ds.interaction_matrix()
    recs = device_recommend(scorer, mixed, 5, matrix, chunk=4)
    assert len(recs.lookup(999_999_999)) == 0
    known = recs.lookup(int(ds.users.ids[0]))
    hist = set(matrix.row_items(int(ds.users.ids[0])).ids().tolist())
    # a known user gets recommendations iff unseen catalog items remain
    # (a degenerate set where user 0 saw every item yields an empty list)
    n_candidates = ds.item_count - len(hist)
    assert len(known) == min(5, n_candidates)
    assert not (set(known.ids().tolist()) & hist)


@SLOW
@given(interaction_sets())
def test_fold_in_matches_per_query_scoring(data):
    """The serving fold-in kernel must agree with the per-query
    new_user_embedding path (same math, vectorized)."""
    users, items, nu, ni = data
    ds = from_interactions_df(pd.DataFrame({"user_id": users, "item_id": items}))
    rng = np.random.default_rng(3)
    k = 8
    s = ImplicitMFScorer(ImplicitMFScorer.validate_config({"features": k}))
    s.users = ds.users
    s.items = ds.items
    s.user_embeddings = rng.standard_normal((len(ds.users.ids), k)).astype(np.float32)
    s.item_embeddings = rng.standard_normal((len(ds.items.ids), k)).astype(np.float32)
    import jax.numpy as jnp

    s._OtOr = np.asarray(als_ops.implicit_otor(jnp.asarray(s.item_embeddings), jnp.float32(0.1)))

    uid = int(ds.users.ids[0])
    hist = ds.user_row(uid)
    u_pq, _ = s.new_user_embedding(None, hist)

    cols = hist.numbers(vocabulary=ds.items).astype(np.int32)
    H = max(len(cols), 1)
    cm = np.zeros((1, H), np.int32)
    cm[0, : len(cols)] = cols
    mask = np.zeros((1, H), bool)
    mask[0, : len(cols)] = True
    u_dev, _ = s.device_fold_in(jnp.asarray(cm), None, jnp.asarray(mask))
    # the two paths use different solvers (batched GJ vs per-row solve), so
    # agreement is numeric, not bitwise
    np.testing.assert_allclose(np.asarray(u_dev)[0], np.asarray(u_pq), rtol=2e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# plan invariants


@given(
    st.lists(st.integers(-1, 40), min_size=1, max_size=200),
    st.integers(1, 16),
)
@settings(max_examples=60, deadline=None)
def test_plan_groups_partitions_users(nums_list, block):
    nums = np.asarray(nums_list, dtype=np.int64)
    lens = np.arange(41, dtype=np.int32) * 3  # user u has 3u interactions
    plan = plan_groups(nums, lens, block)
    # order is a permutation
    assert sorted(plan.order.tolist()) == list(range(len(nums)))
    # padded nums = sorted nums + -1 padding to a block multiple
    assert len(plan.nums_padded) % block == 0
    assert (plan.nums_padded[len(nums) :] == -1).all()
    np.testing.assert_array_equal(plan.nums_padded[: len(nums)], nums[plan.order])
    # groups tile the chunk range exactly once, in order
    spans = [(g.start, g.start + g.chunks) for g in plan.groups]
    assert spans[0][0] == 0
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c
    assert spans[-1][1] == len(plan.nums_padded) // block
    # every group's width covers the longest history among its users
    for g in plan.groups:
        lo, hi = g.start * block, (g.start + g.chunks) * block
        seg = plan.nums_padded[lo:hi]
        seg = seg[seg >= 0]
        maxlen = int(lens[seg].max()) if len(seg) else 0
        assert g.width >= max(maxlen, 1)
        # and is a ladder rung
        assert g.width == _ladder_width(g.width)


@given(st.integers(0, 100_000))
@settings(max_examples=50, deadline=None)
def test_ladder_width_properties(n):
    w = _ladder_width(n)
    assert w >= max(n, 64)
    assert w == 64 or w // 2 < max(n, 64) <= w
