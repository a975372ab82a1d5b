"""
Structured logging, progress reporting, and task tracking.

Capability parity with the reference logging subsystem
(reference: src/lenskit/logging/): structlog-style key-value loggers
(``get_logger``), TRACE-level tracing, progress bars (Rich/plain),
stopwatches, resource measurement, and hierarchical Task tracking.

Design: stdlib ``logging`` core with a key-value adapter (structlog is not in
the image); Rich for console rendering when a TTY is attached.
"""

from lkpy_tpu.logging.logger import LoggingConfig, LKLogger, basic_logging, get_logger, notebook_logging
from lkpy_tpu.logging.progress import Progress, item_progress, set_progress_impl
from lkpy_tpu.logging.resource import max_memory, reset_linux_hwm
from lkpy_tpu.logging.stopwatch import Stopwatch
from lkpy_tpu.logging.tasks import Task
from lkpy_tpu.logging.tracing import Tracer, activate_tracing, trace, tracing_active

__all__ = [
    "LKLogger",
    "LoggingConfig",
    "notebook_logging",
    "Progress",
    "Stopwatch",
    "Task",
    "Tracer",
    "activate_tracing",
    "basic_logging",
    "get_logger",
    "item_progress",
    "max_memory",
    "reset_linux_hwm",
    "set_progress_impl",
    "trace",
    "tracing_active",
]
