"""
Shared component test bases.

Capability parity with the reference's uniform model test grid
(reference: src/lenskit/testing/_components.py:29 ``BasicComponentTests`` —
config round-trips; :110 ``ScorerTests`` — train / score known & unknown
users / empty queries / pickle round-trip / topn pipeline runs; accuracy
gates :348,365).

Subclass and set ``component`` (and optionally ``config``,
``expected_rmse``, ``expected_ndcg``, ``needs_ratings``).
"""

from __future__ import annotations

import pickle

import numpy as np
import pytest

from lkpy_tpu.data import Dataset, ItemList, RecQuery
from lkpy_tpu.metrics import quick_measure_model
from lkpy_tpu.pipeline import topn_pipeline
from lkpy_tpu.training import TrainingOptions

__all__ = ["BasicComponentTests", "ScorerTests", "TrainingTests"]


class BasicComponentTests:
    """Config instantiation + round-trip tests (reference: _components.py:29)."""

    component: type
    config: object | None = None

    def _make(self):
        if self.config is not None:
            return self.component(self.config)
        return self.component()

    def test_instantiate_default(self):
        comp = self._make()
        assert comp is not None

    def test_config_roundtrip(self):
        comp = self._make()
        dumped = comp.dump_config()
        comp2 = self.component(self.component.validate_config(dumped))
        assert comp2.dump_config() == dumped


class TrainingTests(BasicComponentTests):
    """Common training tests (reference: _components.py:74 ``TrainingTests``):
    the component trains on MovieLens and reports itself trained.  Scorers
    get the full grid from :class:`ScorerTests`; use this base directly for
    trainable non-scorer components."""

    @pytest.fixture(scope="class")
    def trained_component(self, ml_ds: Dataset):
        comp = self._make()
        comp.train(ml_ds, TrainingOptions(rng=42))
        return comp

    def test_is_trained(self, trained_component):
        assert getattr(trained_component, "is_trained", True)

    def test_retrain_false_is_noop(self, trained_component):
        # retrain=False on an already-trained component must not clobber it
        before = pickle.dumps(trained_component.dump_config())
        trained_component.train(None, TrainingOptions(retrain=False))
        assert pickle.dumps(trained_component.dump_config()) == before


class ScorerTests(BasicComponentTests):
    """Train/score grid on MovieLens (reference: _components.py:110)."""

    can_score: str = "all"  # "all" | "some"
    needs_ratings: bool = False
    expected_rmse: tuple[float, float] | None = None
    expected_ndcg: float | None = None
    use_dense_gate: bool = False
    #: config used by the (slow) accuracy-gate tests; defaults to ``config``.
    #: Grid tests run tiny configs for speed, gates run realistic ones.
    eval_config: object | None = None
    #: dataset the fast grid trains on: "full" (ml-latest-small) or "dense"
    #: (the >=20-ratings-per-item subset) — closed-form models whose train
    #: cost scales with the item-catalog square (SLIM/EASE/association) use
    #: the dense subset to keep the fast suite fast; accuracy gates are
    #: unaffected (they pick their own dataset).
    grid_dataset: str = "full"

    def _make_eval(self):
        if self.eval_config is not None:
            return self.component(self.eval_config)
        return self._make()

    @pytest.fixture(scope="class")
    def grid_ds(self, ml_ds: Dataset, ml_dense_ds: Dataset) -> Dataset:
        return ml_dense_ds if self.grid_dataset == "dense" else ml_ds

    @pytest.fixture(scope="class")
    def trained(self, grid_ds: Dataset):
        comp = self._make()
        comp.train(grid_ds, TrainingOptions(rng=42))
        return comp

    def _query(self, ml_ds, user_id=1):
        hist = ml_ds.user_row(user_id)
        return RecQuery(user_id=user_id, user_items=hist)

    def _score(self, trained, items, query):
        """Call the scorer, passing ``query`` only if its signature takes one
        (PopScorer-style components score items without a query, mirroring
        reference basic/popularity.py)."""
        import inspect

        params = inspect.signature(type(trained).__call__).parameters
        if "query" in params:
            return trained(query=query, items=items)
        return trained(items=items)

    def test_score_known_items(self, trained, grid_ds):
        out = self._score(trained, ItemList(item_ids=[31, 1029, 296]), self._query(grid_ds))
        assert len(out) == 3
        s = out.scores()
        assert s is not None
        if self.can_score == "all":
            assert np.isfinite(s).all()

    def test_score_unknown_item(self, trained, grid_ds):
        out = self._score(trained, ItemList(item_ids=[9999999]), self._query(grid_ds))
        assert len(out) == 1

    def test_score_unknown_user(self, trained, grid_ds):
        q = RecQuery(user_id=99999999)
        out = self._score(trained, ItemList(item_ids=[31]), q)
        assert len(out) == 1

    def test_empty_query(self, trained, grid_ds):
        out = self._score(trained, ItemList(item_ids=[31, 1029]), RecQuery())
        assert len(out) == 2

    def test_empty_items(self, trained, grid_ds):
        out = self._score(trained, ItemList(), self._query(grid_ds))
        assert len(out) == 0

    def test_pickle_roundtrip(self, trained, grid_ds):
        copy = pickle.loads(pickle.dumps(trained))
        q = self._query(grid_ds)
        items = ItemList(item_ids=[31, 1029, 296])
        a = self._score(copy, items, q).scores()
        b = self._score(trained, items, q).scores()
        if a is None or (hasattr(a, "dtype") and not np.issubdtype(np.asarray(a).dtype, np.number)):
            assert (a is None) == (b is None)
            return
        np.testing.assert_allclose(a, b, equal_nan=True, rtol=1e-6)

    def test_topn_pipeline_run(self, grid_ds):
        pipe = topn_pipeline(self._make(), n=10)
        pipe.train(grid_ds, TrainingOptions(rng=42))
        from lkpy_tpu import recommend

        recs = recommend(pipe, query=1, n=10)
        assert len(recs) <= 10
        assert recs.ordered

    @pytest.mark.slow
    @pytest.mark.eval
    def test_batch_prediction_accuracy(self, ml_ds, ml_dense_ds):
        """RMSE gate (reference: _components.py:348)."""
        if self.expected_rmse is None:
            pytest.skip("no expected RMSE")
        ds = ml_dense_ds if self.use_dense_gate else ml_ds
        res = quick_measure_model(self._make_eval(), ds, predicts_ratings=True, rng=42, user_frac=0.5)
        rmse = float(res.list_summary().loc["RMSE", "mean"])
        lo, hi = self.expected_rmse
        assert lo <= rmse <= hi

    @pytest.mark.slow
    @pytest.mark.eval
    def test_batch_top_n_accuracy(self, ml_ds, ml_dense_ds):
        """NDCG gate (reference: _components.py:365)."""
        if self.expected_ndcg is None:
            pytest.skip("no expected NDCG")
        ds = ml_dense_ds if self.use_dense_gate else ml_ds
        res = quick_measure_model(self._make_eval(), ds, rng=42, user_frac=0.5)
        ndcg = float(res.list_summary().loc["NDCG@20", "mean"])
        assert ndcg >= self.expected_ndcg
