"""Tracing / profiling utilities.

Replaces the reference's ad-hoc per-stage ``print(time.time()-t)`` lines
(reference src/msckf.py:184-223) with structured stage timers and
``jax.profiler`` trace hooks.  Device-side stage counters come back through
StepOutput / FrontendOutput fields rather than host prints.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class StageTimer:
    """Accumulating wall-clock stage timer with a one-line JSON report."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self):
        return {
            name: dict(
                total_s=round(self.totals[name], 4),
                count=self.counts[name],
                mean_ms=round(1000 * self.totals[name] / max(self.counts[name], 1), 3),
            )
            for name in self.totals
        }

    def dump(self, path=None):
        s = json.dumps(self.report(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


@contextlib.contextmanager
def device_trace(log_dir):
    """jax.profiler trace context: view with TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region inside traced computations (shows up in XProf)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
