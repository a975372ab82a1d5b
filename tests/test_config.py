import os

from lkpy_tpu.config import Settings, configure, lkpy_tpu_config, load_config


def test_default_config():
    cfg = lkpy_tpu_config()
    assert cfg.parallel.model_axis == 1


def test_configure_context():
    with configure(random_seed=99):
        assert lkpy_tpu_config().random_seed == 99
    assert lkpy_tpu_config().random_seed != 99


def test_load_toml(tmp_path):
    (tmp_path / "lkpy-tpu.toml").write_text("random_seed = 7\n[parallel]\nmodel_axis = 2\n")
    cfg = load_config(tmp_path)
    assert cfg.random_seed == 7
    assert cfg.parallel.model_axis == 2


def test_local_overrides(tmp_path):
    (tmp_path / "lkpy-tpu.toml").write_text("random_seed = 7\n")
    (tmp_path / "lkpy-tpu.local.toml").write_text("random_seed = 8\n")
    cfg = load_config(tmp_path)
    assert cfg.random_seed == 8


def test_env_overrides(tmp_path, monkeypatch):
    monkeypatch.setenv("LKT_RANDOM_SEED", "55")
    cfg = load_config(tmp_path)
    assert cfg.random_seed == 55


def test_embedding_size_exp():
    from lkpy_tpu.models.flexmf import FlexMFImplicitConfig

    cfg = FlexMFImplicitConfig.model_validate({"embedding_size_exp": 6})
    assert cfg.embedding_size == 64


def test_training_perf_ladder_ratio():
    assert lkpy_tpu_config().training_perf.ladder_ratio == 1.35
    with configure(training_perf={"ladder_ratio": 2.0}):
        assert lkpy_tpu_config().training_perf.ladder_ratio == 2.0


def test_ladder_ratio_reaches_als_trainer(ml_ds):
    """The configured ladder ratio must change the ALS bucket program count."""
    from lkpy_tpu.models.als import ImplicitMFScorer
    from lkpy_tpu.training import TrainingOptions

    def n_buckets(ratio):
        with configure(training_perf={"ladder_ratio": ratio}):
            s = ImplicitMFScorer(ImplicitMFScorer.validate_config({"features": 8, "epochs": 1}))
            tr = s.create_trainer(ml_ds, TrainingOptions(rng=42))
            return len(tr.u_buckets) + len(tr.i_buckets)

    assert n_buckets(4.0) < n_buckets(1.2)
