"""Profiling & observability hooks (SURVEY §5: the reference has none —
progress bars only; the TPU build gets real tracing).

- `trace(logdir)`: jax.profiler context; view in TensorBoard / xprof.
- `Stopwatch`: phase wall-clock aggregation with a one-line report.
- `annotate(name)`: TraceAnnotation for custom spans inside host code.
"""
from __future__ import annotations

import contextlib
import time
from collections import OrderedDict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: `with trace('/tmp/trace'): run()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class Stopwatch:
    """Named phase timers: `with sw.phase('oil'): ...`; `print(sw.report())`."""

    def __init__(self):
        self.totals: "OrderedDict[str, float]" = OrderedDict()
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [
            f"{name}: {t:.3f}s ({t / total * 100:.1f}%, n={self.counts[name]})"
            for name, t in self.totals.items()
        ]
        return " | ".join(lines)
