import json

import pytest
from click.testing import CliRunner

from lkpy_tpu.cli import cli

ML = "/root/reference/data/ml-latest-small"


@pytest.fixture
def runner():
    return CliRunner()


def test_doctor(runner):
    res = runner.invoke(cli, ["doctor"])
    assert res.exit_code == 0, res.output
    assert "lkpy-tpu version" in res.output
    assert "jax" in res.output


def test_data_describe(runner):
    res = runner.invoke(cli, ["data", "describe", ML])
    assert res.exit_code == 0, res.output
    assert "users: 671" in res.output


def test_data_convert_and_describe(runner, tmp_path):
    dst = str(tmp_path / "ds")
    res = runner.invoke(cli, ["data", "convert", ML, dst])
    assert res.exit_code == 0, res.output
    res = runner.invoke(cli, ["data", "describe", dst])
    assert res.exit_code == 0, res.output


def test_data_split(runner, tmp_path):
    dst = str(tmp_path / "split")
    res = runner.invoke(cli, ["data", "split", "--users", "20", ML, dst])
    assert res.exit_code == 0, res.output
    assert (tmp_path / "split" / "train" / "schema.json").exists()
    assert (tmp_path / "split" / "test.parquet").exists()


def test_train_recommend(runner, tmp_path):
    model = str(tmp_path / "bias.pkl")
    res = runner.invoke(
        cli, ["train", "-m", "bias", "-p", "damping=5.0", "-o", model, ML]
    )
    assert res.exit_code == 0, res.output
    res = runner.invoke(cli, ["recommend", "-m", model, "-n", "5", "1", "2"])
    assert res.exit_code == 0, res.output
    assert "recommendations for user 1" in res.output


def test_pipeline_expand(runner):
    res = runner.invoke(cli, ["pipeline", "expand", "-m", "bias"])
    assert res.exit_code == 0, res.output
    cfg = json.loads(res.output)
    assert "components" in cfg
    assert any("BiasScorer" in c["code"] for c in cfg["components"].values())


def test_pipeline_diagram(runner):
    res = runner.invoke(cli, ["pipeline", "diagram", "-m", "pop"])
    assert res.exit_code == 0, res.output
    assert "flowchart TD" in res.output
