"""``lkpy-tpu config`` — show active configuration (reference: cli/config.py)."""

from __future__ import annotations

import json

import click


@click.command("config")
@click.option("--json", "as_json", is_flag=True, help="emit JSON")
def config(as_json: bool):
    """Print the active lkpy-tpu configuration."""
    from lkpy_tpu.config import lkpy_tpu_config

    cfg = lkpy_tpu_config()
    if as_json:
        click.echo(cfg.model_dump_json(indent=2))
    else:
        for line in json.dumps(cfg.model_dump(), indent=2).splitlines():
            click.echo(line)
