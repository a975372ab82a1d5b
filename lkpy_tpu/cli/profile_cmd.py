"""``lkpy-tpu profile`` subcommands (reference: src/lenskit/cli/profile/summarize.py)."""

from __future__ import annotations

import click


@click.group("profile")
def profile():
    """Pipeline profiling utilities."""


@profile.command("summarize")
@click.argument("file", type=click.Path(exists=True))
def summarize(file):
    """Summarize a pipeline profile CSV."""
    from lkpy_tpu.pipeline import summarize_profile

    df = summarize_profile(file)
    click.echo(df.to_string(float_format=lambda v: f"{v:.3f}"))
