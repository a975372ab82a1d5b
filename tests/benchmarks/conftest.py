"""
Local micro-benchmark harness (pytest-benchmark is not in the image).

Mirrors the reference's ``tests/benchmarks`` usage
(reference: tests/benchmarks/benchmark_index.py:21): each test calls
``benchmark(fn)``; the fixture times a few repetitions, records the
per-call latency, and asserts only that the op completes — these are
smoke-speed measurements, not CI-gated numbers (SURVEY.md §4).
"""

import time

import numpy as np
import pytest


class _Bench:
    def __init__(self, node_name: str):
        self.name = node_name
        self.per_call_us: float | None = None

    def __call__(self, fn, *args, reps: int = 5, **kwargs):
        fn(*args, **kwargs)  # warm (jit/alloc)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args, **kwargs)
        dt = (time.perf_counter() - t0) / reps
        self.per_call_us = dt * 1e6
        return out


_RESULTS: list[_Bench] = []


@pytest.fixture()
def benchmark(request):
    b = _Bench(request.node.name)
    yield b
    if b.per_call_us is not None:
        _RESULTS.append(b)


@pytest.fixture()
def rng() -> np.random.Generator:
    return np.random.default_rng(42)


def pytest_terminal_summary(terminalreporter):
    if _RESULTS:
        terminalreporter.write_line("")
        terminalreporter.write_line("microbenchmarks (per call):")
        for b in sorted(_RESULTS, key=lambda x: x.name):
            terminalreporter.write_line(f"  {b.name:48s} {b.per_call_us:12.1f} us")
