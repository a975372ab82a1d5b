"""``python -m lkpy_tpu.cli`` entry point."""

from lkpy_tpu.cli import main

main()
