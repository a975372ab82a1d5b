"""TrainingOptions environment API (reference: tests/training/test_training_options.py)."""

from lkpy_tpu.testing import set_env_var
from lkpy_tpu.training import TrainingOptions


def test_env_var_unset_is_none():
    assert TrainingOptions().env_var("LKT_PROBE_VAR") is None
    assert TrainingOptions().env_var("LKT_PROBE_VAR", "dflt") == "dflt"


def test_env_var_local_dict_wins():
    opts = TrainingOptions(environment={"LKT_PROBE_VAR": "local"})
    with set_env_var("LKT_PROBE_VAR", "process"):
        assert opts.env_var("LKT_PROBE_VAR") == "local"
    assert opts.env_var("LKT_PROBE_VAR") == "local"


def test_env_var_from_process_env():
    with set_env_var("LKT_PROBE_VAR", "process"):
        assert TrainingOptions().env_var("LKT_PROBE_VAR") == "process"
    assert TrainingOptions().env_var("LKT_PROBE_VAR") is None


def test_env_flag_truthy_spellings():
    for v in ("1", "t", "TRUE", "y", "Yes", "on"):
        assert TrainingOptions(environment={"F": v}).env_flag("F"), v


def test_env_flag_falsy_spellings():
    for v in ("0", "f", "False", "N", "no", "OFF"):
        assert not TrainingOptions(environment={"F": v}).env_flag("F"), v


def test_env_flag_default_and_garbage():
    opts = TrainingOptions()
    assert not opts.env_flag("LKT_PROBE_FLAG")
    assert opts.env_flag("LKT_PROBE_FLAG", default=True)
    # unparseable values fall back to the default
    assert TrainingOptions(environment={"F": "banana"}).env_flag("F", default=True)
    assert not TrainingOptions(environment={"F": "banana"}).env_flag("F")


def test_set_env_var_restores_prior_value():
    import os

    with set_env_var("LKT_PROBE_VAR", "outer"):
        with set_env_var("LKT_PROBE_VAR", "inner"):
            assert os.environ["LKT_PROBE_VAR"] == "inner"
        assert os.environ["LKT_PROBE_VAR"] == "outer"
        with set_env_var("LKT_PROBE_VAR", None):
            assert "LKT_PROBE_VAR" not in os.environ
        assert os.environ["LKT_PROBE_VAR"] == "outer"
    assert "LKT_PROBE_VAR" not in os.environ
