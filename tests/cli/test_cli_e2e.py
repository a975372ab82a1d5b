"""Shell-level CLI end-to-end test — runs the real command line in a
subprocess, unlike the click-runner tests (reference: tests/cli/harness.sh,
test-train-recommend.sh run the installed ``lenskit`` binary)."""

import subprocess
import sys
from pathlib import Path

import pytest

SCRIPT = Path(__file__).parent / "e2e.sh"


@pytest.mark.slow
def test_cli_shell_e2e():
    res = subprocess.run(
        ["bash", str(SCRIPT)], capture_output=True, text=True, timeout=900
    )
    sys.stdout.write(res.stdout)
    sys.stderr.write(res.stderr[-2000:])
    assert res.returncode == 0, "shell e2e harness failed"
    assert "not ok" not in res.stdout
