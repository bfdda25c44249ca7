"""Tracing / profiling hooks (aux subsystem #1 — ABSENT in the reference,
which has only tqdm bars; SURVEY.md §5.1 asks the rebuild to provide
jax.profiler traces + per-step timing).

Usage:
    with trace("logs/trace"):          # XLA/TPU profile, view in XProf
        step(...)

    timer = StepTimer()
    with timer.step():                 # host-side wall-clock per step
        ...
    timer.summary()                    # {mean, p50, p90, steps/sec}
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """jax.profiler trace scope; writes a TensorBoard/XProf trace."""
    import jax

    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=False,
                             create_perfetto_trace=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the device trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Host-side per-step wall-clock accumulator."""

    def __init__(self, max_keep: int = 10000):
        self.durations: List[float] = []
        self.max_keep = max_keep

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.durations.append(time.perf_counter() - t0)
            if len(self.durations) > self.max_keep:
                del self.durations[: -self.max_keep]

    def summary(self, skip_first: int = 1) -> Dict[str, float]:
        d = sorted(self.durations[skip_first:] or self.durations)
        if not d:
            return {}
        n = len(d)
        mean = sum(d) / n
        return {
            "steps": n,
            "mean_s": mean,
            "p50_s": d[n // 2],
            "p90_s": d[min(n - 1, int(0.9 * n))],
            "steps_per_sec": (1.0 / mean) if mean > 0 else float("inf"),
        }
