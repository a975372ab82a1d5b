"""
Batch (offline) inference.

Capability parity with reference ``lenskit.batch``
(reference: src/lenskit/batch/__init__.py, _runner.py:60): the
``BatchPipelineRunner`` with recommend/predict/score invocations, plus
module-level ``recommend``/``predict``/``score`` helpers.

TPU-native notes: generic pipelines run per-query on the host (like the
reference's sequential/thread paths); scorers that implement the
``score_batch`` protocol (``lkpy_tpu.batch.runner.BatchScorer``) get a
device-resident vectorized path where the whole query batch is scored in one
jitted program.
"""

from lkpy_tpu.batch.results import BatchResults
from lkpy_tpu.batch.runner import BatchPipelineRunner, InvocationSpec

__all__ = ["BatchPipelineRunner", "BatchResults", "InvocationSpec", "predict", "recommend", "score"]


def recommend(pipeline, users, n=None, *, queries=None, n_jobs=None, device=True, mesh=None, distributed=False, **kwargs):
    """Batch-recommend for a set of users (reference: batch/__init__.py).

    With ``device=True`` (default), standard topn pipelines over
    embedding-family scorers run the whole batch in one jitted device
    program (lkpy_tpu.batch.device); other pipelines fall back to
    per-query execution.  ``mesh`` shards the query batch over the mesh's
    data axis; ``distributed=True`` additionally splits the query list
    across processes and gathers results on the coordinator
    (lkpy_tpu.batch.distributed — the reference's Ray fan-out analog)."""
    from lkpy_tpu.data import ItemListCollection

    if device and queries is None and not isinstance(users, ItemListCollection):
        flat = _flatten_user_ids(users)
        if flat is None:
            device = False
        else:
            users = flat
    if device and queries is None and not isinstance(users, ItemListCollection):
        if distributed:
            from lkpy_tpu.batch.device import supports_device_batch
            from lkpy_tpu.batch.distributed import distributed_recommend

            scorer = pipeline.node("scorer").component
            lookup = pipeline.node("history-lookup").component
            if supports_device_batch(scorer) and lookup.interactions is not None:
                return distributed_recommend(
                    scorer, users, n if n is not None else 10, lookup.interactions, mesh=mesh
                )
        from lkpy_tpu.batch.device import try_device_recommend

        fast = try_device_recommend(pipeline, users, n, mesh=mesh, exact=kwargs.get("exact"))
        if fast is not None:
            return fast
    runner = BatchPipelineRunner(n_jobs=n_jobs)
    runner.recommend(n=n)
    res = runner.run(pipeline, users if queries is None else queries)
    return res.output("recommendations")


def _flatten_user_ids(users):
    """Normalize a user-query sequence to a flat ID array for the device
    batch path; returns None when the inputs need per-query handling
    (RecQuery objects, mappings with candidate lists, ...).  Accepts plain
    IDs and single-field key tuples (e.g. ``split.test.keys()``)."""
    from collections.abc import Mapping

    import numpy as np

    if isinstance(users, Mapping):
        # Mapping inputs carry per-query candidate lists in the values;
        # list(users) would silently drop them — take the runner path.
        return None
    try:
        seq = list(users)
    except TypeError:
        return None
    flat = []
    for u in seq:
        if isinstance(u, tuple):
            if len(u) != 1:
                return None
            u = u[0]
        elif hasattr(u, "_fields"):  # namedtuple key
            vals = tuple(u)
            if len(vals) != 1:
                return None
            u = vals[0]
        if isinstance(u, np.generic):
            u = u.item()
        if not isinstance(u, (int, str, np.integer)):
            return None
        flat.append(u)
    return np.asarray(flat)


def predict(pipeline, pairs, *, n_jobs=None, **kwargs):
    """Batch rating prediction for user-item pairs (reference: batch/__init__.py)."""
    runner = BatchPipelineRunner(n_jobs=n_jobs)
    runner.predict()
    res = runner.run(pipeline, pairs)
    return res.output("predictions")


def score(pipeline, pairs, *, n_jobs=None, **kwargs):
    """Batch scoring for user-item pairs (reference: batch/__init__.py)."""
    runner = BatchPipelineRunner(n_jobs=n_jobs)
    runner.score()
    res = runner.run(pipeline, pairs)
    return res.output("scores")
