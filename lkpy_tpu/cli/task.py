"""``lkpy-tpu task`` wrapper (reference: src/lenskit/cli/task.py:28):
run a subcommand inside a tracked Task, saving the task record to a file."""

from __future__ import annotations

import click


@click.command("task", context_settings={"ignore_unknown_options": True})
@click.option("--save-to", type=click.Path(), required=True, help="task record JSON output")
@click.option("--label", default="cli-task")
@click.argument("args", nargs=-1, type=click.UNPROCESSED)
@click.pass_context
def task(ctx, save_to, label, args):
    """Run another lkpy-tpu command inside a tracked task."""
    from lkpy_tpu.cli import cli
    from lkpy_tpu.logging import Task

    with Task(label, file=save_to):
        cli.main(args=list(args), standalone_mode=False)
    click.echo(f"task record saved to {save_to}")
