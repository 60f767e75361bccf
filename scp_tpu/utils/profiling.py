"""Tracing / profiling utilities.

The reference's only instrumentation is wall-clock accumulation around
model calls (reference encode.py:50-52, decode_ehem.py:83-85).  Here:

  * StageTimers — named wall-clock accumulators with a report line;
  * trace(dir) — context manager around jax.profiler.trace, producing a
    TensorBoard-loadable XPlane trace of device execution;
  * annotate(name) — TraceAnnotation for host-side phases.

Enable codec tracing with SCP_TRACE_DIR=<dir>.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict


class StageTimers:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        parts = [
            f"{k}={v:.3f}s/{self.counts[k]}" for k, v in sorted(self.totals.items())
        ]
        return " ".join(parts)


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """jax.profiler trace if a directory is given (or SCP_TRACE_DIR set)."""
    log_dir = log_dir or os.environ.get("SCP_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)
