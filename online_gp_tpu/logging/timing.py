"""Wall-clock span timing (the reference's only tracing facility —
``time.time()`` spans logged as ``step_time``; SURVEY.md §5) plus an
optional jax.profiler hook for real TPU traces."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax


class Timer:
    """Accumulates named wall-clock spans; blocks on device work so spans
    measure TPU execution, not dispatch."""

    def __init__(self):
        self.spans: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def span(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.spans.setdefault(name, []).append(time.perf_counter() - t0)

    def last(self, name: str) -> float:
        return self.spans[name][-1]

    def total(self, name: str) -> float:
        return sum(self.spans.get(name, []))


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
