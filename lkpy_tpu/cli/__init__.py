"""
Command-line interface.

Capability parity with the reference CLI (reference: src/lenskit/cli/__init__.py:47
click group with subcommands ``data``, ``train``, ``recommend``, ``tune``,
``pipeline``, ``doctor``, ``task``).
"""

from __future__ import annotations

import logging

import click

from lkpy_tpu.logging import LoggingConfig

__all__ = ["main", "cli"]


@click.group("lkpy-tpu")
@click.option("-v", "--verbose", count=True, help="enable verbose logging")
def cli(verbose: int):
    """lkpy-tpu: TPU-native recommender toolkit."""
    lc = LoggingConfig()
    if verbose:
        lc.set_verbose(verbose)
    lc.apply()
    # honor JAX_PLATFORMS even when a site hook pre-imported jax and latched
    # a different platform before env processing (restores documented JAX
    # env semantics for CLI users)
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:  # backend already initialized
            pass


from lkpy_tpu.cli.config_cmd import config  # noqa: E402
from lkpy_tpu.cli.data import data  # noqa: E402
from lkpy_tpu.cli.doctor import doctor  # noqa: E402
from lkpy_tpu.cli.pipeline_cmd import pipeline  # noqa: E402
from lkpy_tpu.cli.profile_cmd import profile  # noqa: E402
from lkpy_tpu.cli.recommend import recommend  # noqa: E402
from lkpy_tpu.cli.task import task  # noqa: E402
from lkpy_tpu.cli.train import train  # noqa: E402
from lkpy_tpu.cli.tune import tune  # noqa: E402

cli.add_command(config)
cli.add_command(data)
cli.add_command(doctor)
cli.add_command(pipeline)
cli.add_command(profile)
cli.add_command(recommend)
cli.add_command(task)
cli.add_command(train)
cli.add_command(tune)


def main():
    cli(auto_envvar_prefix="LKT")


if __name__ == "__main__":
    main()
