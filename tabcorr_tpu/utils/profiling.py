"""Lightweight timing and device-trace hooks.

The reference has no tracing/profiling beyond a verbose flag and a progress
bar (SURVEY section 5).  This module adds the minimal observability layer a
production deployment needs: wall-clock phase timers (collected, not just
printed) and a context manager around ``jax.profiler`` for device traces.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("tabcorr_tpu")


class Timer:
    """Collects named wall-clock phase timings.

    >>> timer = Timer()
    >>> with timer("pair counting"):
    ...     do_work()
    >>> timer.summary()
    """

    def __init__(self):
        self.records: list[tuple[str, float]] = []

    @contextlib.contextmanager
    def __call__(self, name):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self.records.append((name, elapsed))
            logger.debug("%s: %.3f s", name, elapsed)

    def total(self, name=None):
        return sum(t for n, t in self.records
                   if name is None or n == name)

    def summary(self):
        lines = [f"  {name}: {elapsed:.3f} s"
                 for name, elapsed in self.records]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir):
    """Capture a jax.profiler device trace around a code block.

    View with TensorBoard or Perfetto; no-op overhead when unused.
    """
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
