"""Tracing / profiling utilities (SURVEY.md §5).

The reference includes <chrono> but never uses it
(`src/multigrid.cpp:9`); observability here is first-class: stage
timers with jax.profiler trace annotations, and a stage-report helper
used by the hierarchy builder and benchmarks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional, Tuple

import jax


class StageTimer:
    """Wall-clock stage timer that also emits jax.profiler annotations.

    Usage::

        timer = StageTimer()
        with timer.stage("knn"):
            graph = knn_graph(points, k)
        print(timer.report())
    """

    def __init__(self) -> None:
        self.stages: List[Tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            yield
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.stages.append((name, time.perf_counter() - t0))

    def total(self) -> float:
        return sum(t for _, t in self.stages)

    def report(self) -> str:
        lines = [f"  {name:<28s} {t * 1000:10.2f} ms"
                 for name, t in self.stages]
        lines.append(f"  {'TOTAL':<28s} {self.total() * 1000:10.2f} ms")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, t in self.stages:
            out[name] = out.get(name, 0.0) + t
        return out


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Capture a device profile around a code block (TensorBoard format)
    when ``log_dir`` is given; no-op otherwise."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
