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


def test_locate_config_in_cwd(tmp_path):
    from lkpy_tpu.config import locate_configuration_root

    (tmp_path / "lkpy-tpu.toml").write_text("")
    assert locate_configuration_root(cwd=tmp_path) == tmp_path.resolve()


def test_locate_config_in_parent(tmp_path):
    from lkpy_tpu.config import locate_configuration_root

    (tmp_path / "lkpy-tpu.toml").write_text("")
    sub = tmp_path / "a" / "b"
    sub.mkdir(parents=True)
    assert locate_configuration_root(cwd=sub) == tmp_path.resolve()


def test_locate_stops_at_git_root(tmp_path):
    """A .git directory without a config file ends the search
    (reference: tests/config/test_locate.py test_stop_git)."""
    from lkpy_tpu.config import locate_configuration_root

    (tmp_path / "lkpy-tpu.toml").write_text("")
    proj = tmp_path / "proj"
    (proj / ".git").mkdir(parents=True)
    sub = proj / "src"
    sub.mkdir()
    assert locate_configuration_root(cwd=sub) is None
    # unless the stop is disabled
    assert locate_configuration_root(cwd=sub, abort_at_gitroot=False) == tmp_path.resolve()


def test_locate_stops_at_pyproject(tmp_path):
    from lkpy_tpu.config import locate_configuration_root

    (tmp_path / "lkpy-tpu.toml").write_text("")
    proj = tmp_path / "proj"
    proj.mkdir()
    (proj / "pyproject.toml").write_text("")
    sub = proj / "deep"
    sub.mkdir()
    assert locate_configuration_root(cwd=sub) is None


def test_locate_config_beside_git(tmp_path):
    """A config file in the SAME dir as .git wins (checked before the stop)."""
    from lkpy_tpu.config import locate_configuration_root

    proj = tmp_path / "proj"
    (proj / ".git").mkdir(parents=True)
    (proj / "lkpy-tpu.toml").write_text("")
    sub = proj / "src"
    sub.mkdir()
    assert locate_configuration_root(cwd=sub) == proj.resolve()


def test_load_config_uses_located_root(tmp_path, monkeypatch):
    from lkpy_tpu.config import load_config

    (tmp_path / "lkpy-tpu.toml").write_text('random_seed = 777\n')
    sub = tmp_path / "nested"
    sub.mkdir()
    monkeypatch.chdir(sub)
    cfg = load_config()
    assert cfg.random_seed == 777


def test_locate_anchors_on_local_file_alone(tmp_path):
    """A directory holding only the local-override file is a valid config
    root (round-5 review: load_config merges both files)."""
    from lkpy_tpu.config import locate_configuration_root

    (tmp_path / "lkpy-tpu.local.toml").write_text("")
    sub = tmp_path / "deep"
    sub.mkdir()
    assert locate_configuration_root(cwd=sub) == tmp_path.resolve()
