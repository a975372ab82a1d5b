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
