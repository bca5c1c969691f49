"""Tracing / profiling harness (SURVEY.md §5: the reference has only ad-hoc
time.time() spans, eval_mhop_retrieval.py:170-176).

Two tools:
  * `stage_timer`  — named wall-clock spans accumulated into a report
                     (host-side; device work must be synced by the caller)
  * `device_trace` — jax.profiler trace context writing a TensorBoard-
                     loadable trace directory (works on TPU and CPU)
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimers:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {name: {"total_s": self.totals[name],
                       "count": self.counts[name],
                       "mean_ms": 1e3 * self.totals[name] / self.counts[name]}
                for name in self.totals}

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
