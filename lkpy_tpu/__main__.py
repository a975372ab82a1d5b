"""``python -m lkpy_tpu`` entry point (the ``lkpy-tpu`` CLI)."""

from lkpy_tpu.cli import main

main()
