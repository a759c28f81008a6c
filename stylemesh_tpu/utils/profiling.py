"""Profiling and tracing — a capability the reference lacks entirely
(SURVEY.md §5: no profiler hooks anywhere).

- :func:`trace` context: wraps a region in a ``jax.profiler`` trace dump
  viewable in TensorBoard/Perfetto.
- :func:`annotate`: named `TraceAnnotation` for step phases.
- :class:`StepProfiler`: lightweight wall-clock breakdown (host-side) for
  the train loop (data / step / logging).
"""

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Capture a jax profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named trace annotation (shows up on the TPU timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepProfiler:
    """Host-side phase timing: ``with prof.phase('data'): ...``."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self):
        return {k: {"total_s": round(v, 3),
                    "mean_ms": round(1000 * v / max(self.counts[k], 1), 2)}
                for k, v in self.totals.items()}
