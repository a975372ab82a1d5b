"""
Device-resident batch recommendation.

The TPU-native replacement for the reference's batch fan-out
(reference: src/lenskit/batch/_runner.py:292-308 thread pool and
batch/_ray.py Ray tasks): instead of running the pipeline once per query,
embedding-family scorers expose a ``score_all_items`` batch method and the
whole query batch is scored in one jitted program — a (B, k) × (k, n_items)
MXU matmul, history masking via the device CSR, and a fused top-k.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import jax
import jax.numpy as jnp
import numpy as np

from lkpy_tpu.data import ItemListCollection, MatrixRelationshipSet
from lkpy_tpu.logging import Stopwatch, get_logger

_log = get_logger(__name__)

__all__ = [
    "BatchScorer",
    "PendingRecommend",
    "device_recommend",
    "device_recommend_async",
    "supports_device_batch",
]


@runtime_checkable
class BatchScorer(Protocol):  # pragma: no cover - protocol
    """Scorers that can score all items for a batch of users on device."""

    def batch_score_arrays(self) -> dict:
        """Return device arrays for batch scoring:
        {"u_embed": (n_users, k), "i_embed": (n_items, k),
         "u_bias": optional (n_users,), "i_bias": optional (n_items,),
         "offset": optional scalar}."""
        ...


_dev_cache: dict = {}
_DEV_CACHE_MAX = 32


def invalidate_device_cache() -> None:
    """Drop all cached device copies of scorer tables and training matrices.

    Call after mutating a scorer's embedding/bias arrays IN PLACE between
    serving calls — the cache assumes trained tables are immutable (they are
    for every trainer in this library, which always assigns fresh arrays)."""
    # sweep every registered residency cache (serving CSR, kNN row scales,
    # kNN resident Gram structure, and anything added later) — targeted
    # invalidators (serving.invalidate_resident, knn.invalidate_knn_caches)
    # remain for finer control
    import lkpy_tpu.batch.serving  # noqa: F401 — ensure caches are registered
    import lkpy_tpu.ops.knn  # noqa: F401
    from lkpy_tpu.utils.residency import invalidate_all_residency

    _dev_cache.clear()
    invalidate_all_residency()


def _cached_device(arr):
    """Device-place a host array once per array object.

    Serving calls repeatedly ship the (n_items, k) table to the device
    otherwise — 128 MB per call at 500k items, which dominated product
    serving on remote (tunneled) backends.  Keyed by object identity plus
    the buffer address/shape/dtype (so a reallocated-in-place ndarray — the
    only cheap observable change — misses); jax arrays pass through.

    The cache assumes trained tables are NOT mutated in place between calls
    (all library trainers assign fresh arrays); callers that do mutate must
    call :func:`invalidate_device_cache`.  Bounded FIFO eviction keeps
    non-weakrefable inputs from pinning host+device copies forever."""
    import weakref

    if isinstance(arr, jax.Array):
        return arr
    try:
        addr = arr.__array_interface__["data"][0]
    except (AttributeError, TypeError, KeyError):
        addr = None
    key = (id(arr), addr, getattr(arr, "shape", None), str(getattr(arr, "dtype", "")))
    hit = _dev_cache.get(key)
    if hit is not None and hit[0]() is arr:
        return hit[1]
    dev = jnp.asarray(arr)
    try:
        ref = weakref.ref(arr, lambda _r, key=key: _dev_cache.pop(key, None))
    except TypeError:  # pragma: no cover - non-weakrefable input

        def ref(a=arr):
            return a

    while len(_dev_cache) >= _DEV_CACHE_MAX:
        _dev_cache.pop(next(iter(_dev_cache)))
    _dev_cache[key] = (ref, dev)
    return dev


def supports_device_batch(scorer) -> bool:
    try:
        arrays = _extract_arrays(scorer)
    except (AttributeError, TypeError):
        return False
    return arrays is not None


def _extract_arrays(scorer) -> dict | None:
    """Pull (user table, item table, biases) out of any embedding-family scorer."""
    if hasattr(scorer, "batch_score_arrays"):
        return scorer.batch_score_arrays()
    # ALS / FunkSVD / LightGCN style
    if hasattr(scorer, "user_embeddings") and hasattr(scorer, "item_embeddings"):
        u = scorer.user_embeddings
        i = scorer.item_embeddings
        if u is None or i is None:
            return None
        out = {"u_embed": u, "i_embed": i}
        bias = getattr(scorer, "bias", None)
        if bias is not None and getattr(bias, "user_biases", None) is not None:
            out["u_bias"] = bias.user_biases
            out["i_bias"] = bias.item_biases
            out["offset"] = bias.global_bias
        return out
    # FlexMF params dict
    if hasattr(scorer, "params"):
        p = scorer.params
        out = {"u_embed": p["u_embed"], "i_embed": p["i_embed"]}
        if "u_bias" in p:
            out["u_bias"] = p["u_bias"]
        if "i_bias" in p:
            out["i_bias"] = p["i_bias"]
        if hasattr(scorer, "score_offset"):
            out["offset"] = scorer.score_offset()
        return out
    # SVD / NMF component style
    if hasattr(scorer, "user_components") and hasattr(scorer, "item_components"):
        out = {"u_embed": scorer.user_components, "i_embed": scorer.item_components.T}
        bias = getattr(scorer, "bias", None)
        if bias is not None and getattr(bias, "user_biases", None) is not None:
            out["u_bias"] = bias.user_biases
            out["i_bias"] = bias.item_biases
            out["offset"] = bias.global_bias
        return out
    return None


def try_device_recommend(pipeline, users, n: int | None, *, mesh=None, exact=None) -> ItemListCollection | None:
    """
    Use the device batch path for a *standard* topn pipeline, if possible.

    Conditions: the pipeline has 'scorer'/'ranker'/'history-lookup' nodes in
    the standard shape, the candidate selector excludes only user history,
    and the scorer is embedding-family.  Returns None when unsupported (the
    caller falls back to per-query execution).
    """
    from lkpy_tpu.models.basic import TopNRanker, TrainingItemsCandidateSelector, UserTrainingHistoryLookup

    try:
        scorer = pipeline.node("scorer").component
        ranker = pipeline.node("ranker").component
        lookup = pipeline.node("history-lookup").component
        cand = pipeline.node("candidate-selector").component
    except (KeyError, AttributeError):
        return None
    if not isinstance(ranker, TopNRanker) or not isinstance(lookup, UserTrainingHistoryLookup):
        return None
    if not isinstance(cand, TrainingItemsCandidateSelector) or cand.config.exclude == "none":
        return None
    if lookup.interactions is None or not supports_device_batch(scorer):
        return None
    if n is None or n < 0:
        n = ranker.config.n
    if n is None or n < 0:
        return None
    return device_recommend(scorer, users, n, lookup.interactions, mesh=mesh, exact=exact)


class PendingRecommend:
    """An enqueued batch-recommend call; ``result()`` blocks on the readback
    and assembles the :class:`ItemListCollection`.

    Issuing the next batch's :func:`device_recommend_async` before calling
    ``result()`` pipelines serving: the new batch's device compute overlaps
    this batch's device->host transfer (they use independent resources, so
    steady-state throughput approaches ``max(compute, transfer)`` instead of
    their sum — the TPU form of the reference's overlapped Ray fan-out,
    batch/_ray.py TaskLimiter backpressure)."""

    def __init__(self, pending, user_ids, nums, n, key_field, items_vocab, sw):
        self._pending = pending
        self._user_ids = user_ids
        self._nums = nums
        self._n = n
        self._key_field = key_field
        self._items_vocab = items_vocab
        self._sw = sw

    def result(self) -> ItemListCollection:
        from lkpy_tpu.data.collection import ArrayTopNILC

        scores_s, idx_s, order = self._pending.finalize()
        user_ids, nums = self._user_ids, self._nums
        n = idx_s.shape[1]  # may be < requested n for tiny catalogs
        N = len(user_ids)
        nums_out = np.zeros((N, n), np.int32)
        scores_out = np.full((N, n), -np.inf, np.float32)
        lengths = np.zeros(N, np.int64)
        nums_out[order] = idx_s
        scores_out[order] = scores_s
        # -inf (masked history) sorts to the tail, so the finite prefix is
        # the valid list; unknown users keep length 0 (empty lists)
        lengths[order] = np.isfinite(scores_s).sum(axis=1) * (nums[order] >= 0)
        ilc = ArrayTopNILC(
            [self._key_field], list(user_ids), nums_out, scores_out, lengths, self._items_vocab
        )
        self._sw.stop()
        timings = self._pending.timings or {}
        _log.info(
            "device batch recommend",
            users=N,
            time=str(self._sw),
            us_per_query=round(self._sw.elapsed() * 1e6 / max(N, 1), 1),
            tunnel_ops=timings.get("tunnel_ops"),
        )
        return ilc


def device_recommend(
    scorer,
    user_ids,
    n: int,
    matrix: MatrixRelationshipSet,
    **kw,
) -> ItemListCollection:
    """
    Batch top-N recommendation fully on device.

    Transport is O(1) in the chunk count (see :mod:`lkpy_tpu.batch.serving`):
    the training CSR and scorer tables are device-resident, the only per-call
    upload is the user-number array, histories are gathered on device, and
    the top-n results come back in one compact readback.  See
    :func:`device_recommend_async` for the pipelined form and the argument
    reference.
    """
    return device_recommend_async(scorer, user_ids, n, matrix, **kw).result()


def device_recommend_async(
    scorer,
    user_ids,
    n: int,
    matrix: MatrixRelationshipSet,
    *,
    chunk: int = 1024,
    key_field: str = "user_id",
    mesh=None,
    exact: bool | None = None,
    timings: dict | None = None,
) -> PendingRecommend:
    """
    Enqueue a batch top-N recommendation; returns a :class:`PendingRecommend`
    whose ``result()`` yields the :class:`ItemListCollection`.

    Args:
        scorer: an embedding-family scorer (trained).
        user_ids: user IDs to recommend for.
        n: list length.
        matrix: the training interaction matrix (for history exclusion and
            user/item vocabularies).
        chunk: users per scan block inside the serving programs.
        mesh: optional device mesh — the per-block batch dim shards over its
            ``data`` axis (the TPU analog of the reference's Ray query
            fan-out, batch/_ray.py); the item table is replicated and
            per-query top-n needs no cross-device merge.
        exact: force exact (True) or hardware-TopK approximate (False)
            retrieval; ``None`` (default) defers to ``settings.serving``:
            hardware TopK on TPU for catalogs ≥
            ``serving.approx_min_items`` (recall@n ≥ 0.99, warned once) and
            exact otherwise — pin ``serving.exact = true`` to keep the
            reference's always-exact batch behavior globally.
    """
    from lkpy_tpu.batch.serving import enqueue_serve
    from lkpy_tpu.config import lkpy_tpu_config
    from lkpy_tpu.ops.topk import _warn_approx_once

    arrays = _extract_arrays(scorer)
    if arrays is None:
        raise TypeError(f"{type(scorer).__name__} does not support device batch scoring")
    sw = Stopwatch()
    users_vocab = matrix.row_vocabulary
    items_vocab = matrix.col_vocabulary
    n_items = len(items_vocab)
    csr = matrix.csr("rating")

    serving = lkpy_tpu_config().serving
    if exact is None:
        exact = serving.exact
        if exact is None:
            method = (
                "approx"
                if jax.default_backend() == "tpu" and n_items >= serving.approx_min_items
                else "exact"
            )
        else:
            method = "exact" if exact else "approx"
    else:
        method = "exact" if exact else "approx"
    if method == "approx":
        _warn_approx_once(n_items, 0.99)
    # compact readback (f16 scores, u16 indices) costs score precision; keep
    # exact f32 off-TPU where transfers are free (so CPU tests see exact
    # scores) unless the config pins it
    if serving.readback_precision == "auto":
        compact = jax.default_backend() == "tpu"
    else:
        compact = serving.readback_precision == "f16"

    def _f32_resident(arr):
        dev = _cached_device(arr)
        return dev.astype(jnp.float32) if dev.dtype != jnp.float32 else dev

    i_emb = _f32_resident(arrays["i_embed"])
    i_bias = arrays.get("i_bias")
    i_bias_j = None if i_bias is None else _f32_resident(i_bias)
    offset = float(arrays.get("offset", 0.0))

    user_ids = np.asarray(user_ids)
    nums = users_vocab.numbers(user_ids, missing="negative")

    # fold-in path: recompute user embeddings from history on device
    # (matches the reference's default user_embeddings=True behavior,
    # als/_common.py:133-147); "prefer" uses the trained table directly.
    use_fold = (
        hasattr(scorer, "device_fold_kernel")
        and getattr(getattr(scorer, "config", None), "user_embeddings", None) != "prefer"
    )
    kern = None
    kern_args = ()
    u_table = u_bias_j = None
    # implicit fold-in with use_ratings=False only needs history structure —
    # skip gathering the rating values on device
    needs_vals = use_fold and getattr(scorer, "fold_in_needs_ratings", True)
    if use_fold:
        kern, kern_args = scorer.device_fold_kernel()
    else:
        u_table = _f32_resident(arrays["u_embed"])
        u_bias_t = arrays.get("u_bias")
        u_bias_j = None if u_bias_t is None else _f32_resident(u_bias_t)

    if timings is None:
        timings = {}
    pending = enqueue_serve(
        nums,
        csr,
        n=n,
        n_items=n_items,
        method=method,
        i_emb=i_emb,
        i_bias=i_bias_j,
        offset=offset,
        kern=kern,
        kern_args=kern_args,
        needs_vals=needs_vals,
        u_table=u_table,
        u_bias=u_bias_j,
        block=chunk,
        mesh=mesh,
        compact=compact,
        timings=timings,
    )
    return PendingRecommend(pending, user_ids, nums, n, key_field, items_vocab, sw)
