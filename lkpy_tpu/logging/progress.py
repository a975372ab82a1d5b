"""
Progress reporting (reference: src/lenskit/logging/progress/_dispatch.py:71).

Dispatches to Rich when attached to a TTY, Jupyter widgets inside a
notebook (reference: progress/_notebook.py:1), otherwise a silent/logging
backend.  ``item_progress`` is the standard entry point.
"""

from __future__ import annotations

import sys
from contextlib import contextmanager
from typing import Iterator

__all__ = ["Progress", "item_progress", "set_progress_impl", "item_progress_handle"]

_impl = "auto"


def set_progress_impl(name: str | None):
    """Select the progress backend: "rich", "notebook", "none", or "auto"
    (reference: progress/_dispatch.py:37)."""
    global _impl
    _impl = name or "auto"


def _in_notebook() -> bool:
    """True inside a Jupyter kernel (ZMQ shell)."""
    try:
        from IPython import get_ipython  # type: ignore[import-not-found]
    except ImportError:
        return False
    shell = get_ipython()
    return shell is not None and type(shell).__name__ == "ZMQInteractiveShell"


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


class _JupyterProgress(Progress):
    """ipywidgets-based bar (reference: progress/_notebook.py:26
    ``JupyterProgress``): an IntProgress + completion label displayed in
    the notebook, updated in place and marked ✓ on finish."""

    def __init__(self, label: str, total: int | None = None, unit: str | None = None):
        super().__init__(label, total, unit)
        import ipywidgets as widgets  # type: ignore[import-not-found]
        from IPython.display import display  # type: ignore[import-not-found]

        if total:
            self._bar = widgets.IntProgress(value=0, min=0, max=total, step=1)
        else:
            self._bar = widgets.IntProgress(value=1, min=0, max=1, step=1, bar_style="info")
        self._text = widgets.Label()
        pieces = [widgets.Label(value=label), self._bar, self._text]
        self._box = widgets.HBox(pieces)
        display(self._box)

    def update(self, advance: int = 1, **fields):
        super().update(advance)
        if self.total:
            self._bar.value = self.completed
            self._text.value = f"{self.completed} / {self.total}"

    def finish(self):
        self._bar.bar_style = "success"
        self._text.value = "✓"


def item_progress(label: str, total: int | None = None, unit: str | None = None) -> Progress:
    """Create a progress bar for processing items (reference: _dispatch.py:71)."""
    impl = _impl
    if impl == "auto":
        if _in_notebook():
            impl = "notebook"
        elif sys.stderr.isatty():
            impl = "rich"
    if impl == "notebook":
        try:
            return _JupyterProgress(label, total, unit)
        except Exception:  # pragma: no cover - ipywidgets absent
            import warnings

            warnings.warn("notebook progress backend needs ipywidgets", stacklevel=2)
    if impl == "rich":
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
