"""
Progress reporting (reference: src/lenskit/logging/progress/_dispatch.py:71).

Dispatches to Rich when attached to a TTY, otherwise a silent/logging
backend.  ``item_progress`` is the standard entry point.
"""

from __future__ import annotations

import sys
from contextlib import contextmanager
from typing import Iterator

__all__ = ["Progress", "item_progress", "set_progress_impl", "item_progress_handle"]

_impl = "auto"


def set_progress_impl(name: str | None):
    """Select the progress backend: "rich", "none", or "auto"."""
    global _impl
    _impl = name or "auto"


class Progress:
    """A progress bar handle (no-op base; reference: progress/_base.py)."""

    def __init__(self, label: str, total: int | None = None, unit: str | None = None):
        self.label = label
        self.total = total
        self.completed = 0

    def update(self, advance: int = 1, **fields):
        self.completed += advance

    def finish(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.finish()
        return False


class _RichProgress(Progress):
    def __init__(self, label: str, total: int | None = None, unit: str | None = None):
        super().__init__(label, total, unit)
        from rich.progress import Progress as RP

        self._rp = RP(transient=True)
        self._rp.start()
        self._task = self._rp.add_task(label, total=total)

    def update(self, advance: int = 1, **fields):
        super().update(advance)
        self._rp.update(self._task, advance=advance)

    def finish(self):
        self._rp.stop()


def item_progress(label: str, total: int | None = None, unit: str | None = None) -> Progress:
    """Create a progress bar for processing items (reference: _dispatch.py:71)."""
    use_rich = _impl == "rich" or (_impl == "auto" and sys.stderr.isatty())
    if use_rich:
        try:
            return _RichProgress(label, total, unit)
        except Exception:  # pragma: no cover
            pass
    return Progress(label, total, unit)


@contextmanager
def item_progress_handle(label: str, total: int | None = None) -> Iterator[Progress]:
    pb = item_progress(label, total)
    try:
        yield pb
    finally:
        pb.finish()
