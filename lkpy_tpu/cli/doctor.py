"""``lkpy-tpu doctor`` environment diagnostics (reference: src/lenskit/cli/doctor.py:50)."""

from __future__ import annotations

import platform
import sys

import click


@click.command("doctor")
@click.option("--full", is_flag=True, help="include device details")
def doctor(full: bool):
    """Inspect the runtime environment."""
    import jax
    import numpy
    import pandas
    import pyarrow

    import lkpy_tpu

    click.echo(f"lkpy-tpu version: {lkpy_tpu.__version__}")
    click.echo(f"python: {sys.version.split()[0]} on {platform.platform()}")
    click.echo(f"jax: {jax.__version__}")
    click.echo(f"numpy: {numpy.__version__}  pandas: {pandas.__version__}  pyarrow: {pyarrow.__version__}")
    try:
        devs = jax.devices()
        click.echo(f"devices: {len(devs)} ({devs[0].platform})")
        if full:
            for d in devs:
                click.echo(f"  - {d}")
    except Exception as e:  # pragma: no cover
        click.echo(f"device init failed: {e}")
    from lkpy_tpu.config import lkpy_tpu_config

    cfg = lkpy_tpu_config()
    click.echo(f"config: mesh data={cfg.parallel.data_axis} model={cfg.parallel.model_axis}")
