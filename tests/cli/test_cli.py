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


def test_config_show(runner):
    res = runner.invoke(cli, ["config"])
    assert res.exit_code == 0, res.output
    res = runner.invoke(cli, ["config", "--json"])
    assert res.exit_code == 0, res.output
    cfg = json.loads(res.output)
    assert "parallel" in cfg or len(cfg) > 0


def test_task_wrapper(runner, tmp_path):
    record = str(tmp_path / "task.json")
    res = runner.invoke(cli, ["task", "--save-to", record, "--label", "t", "doctor"])
    assert res.exit_code == 0, res.output
    rec = json.loads(open(record).read())
    assert rec["label"] == "t"
    assert rec["status"] == "finished"


def test_profile_summarize(runner, tmp_path):
    import pandas as pd

    prof = tmp_path / "profile.csv"
    # wide format: one column per pipeline stage, one row per run
    pd.DataFrame(
        {
            "scorer": [0.5, 0.7],
            "ranker": [0.1, 0.2],
        }
    ).to_csv(prof, index=False)
    res = runner.invoke(cli, ["profile", "summarize", str(prof)])
    assert res.exit_code == 0, res.output
    assert "scorer" in res.output


def test_tune_cli(runner, tmp_path):
    spec = tmp_path / "spec.json"
    spec.write_text(
        json.dumps(
            {
                "model": "bias",
                "space": {"damping": {"type": "float", "min": 0.5, "max": 25.0, "log": True}},
                "metric": "RMSE",
                "mode": "minimize",
                "max_points": 2,
                "predicts_ratings": True,
            }
        )
    )
    out = tmp_path / "results.json"
    res = runner.invoke(cli, ["tune", "-s", str(spec), "-o", str(out), ML])
    assert res.exit_code == 0, res.output
    assert "best RMSE" in res.output
    results = json.loads(out.read_text())
    assert len(results["points"]) == 2
    assert 0.5 <= results["best_params"]["damping"] <= 25.0


def test_data_subset(runner, tmp_path):
    dst = str(tmp_path / "sub")
    res = runner.invoke(cli, ["data", "subset", "--min-item-count", "20", ML, dst])
    assert res.exit_code == 0, res.output
    res = runner.invoke(cli, ["data", "describe", dst])
    assert res.exit_code == 0, res.output
    # dense subset has fewer items than the full 9k catalog
    import re

    m = re.search(r"items: (\d+)", res.output)
    assert m and int(m.group(1)) < 9000


def test_data_fetch_airgapped(runner, tmp_path, monkeypatch):
    """fetch with no source dir and no network reports the air-gap cleanly."""
    monkeypatch.delenv("LK_DATA_DIR", raising=False)
    res = runner.invoke(
        cli, ["data", "fetch", "no-such-dataset", str(tmp_path / "out")]
    )
    assert res.exit_code != 0
    assert "not found in local mirrors" in res.output



def test_data_fetch_from_source_dir(runner, tmp_path):
    import pathlib

    src_root = pathlib.Path(ML).parent
    res = runner.invoke(
        cli,
        [
            "data",
            "fetch",
            "--source-dir",
            str(src_root),
            "--convert",
            "ml-latest-small",
            str(tmp_path / "fetched"),
        ],
    )
    assert res.exit_code == 0, res.output
    res = runner.invoke(cli, ["data", "describe", str(tmp_path / "fetched")])
    assert res.exit_code == 0, res.output
