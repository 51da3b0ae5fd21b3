"""Tracing/profiling helpers (SURVEY.md §5 "Tracing / profiling").

The reference has only ad-hoc timing; here every pipeline stage is wrapped in
a jax profiler TraceAnnotation (visible in TensorBoard's profile plugin and
XLA traces) plus a lightweight host-side stage timer that bench mode reports.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class StageTimer:
    """Accumulates wall-time per named stage; thread-unsafe by design (one
    per pipeline invocation)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                self.totals[name] += time.perf_counter() - t0
                self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"total_ms": round(self.totals[name] * 1e3, 2),
                   "calls": self.counts[name],
                   "mean_ms": round(
                       self.totals[name] / max(self.counts[name], 1) * 1e3,
                       2)}
            for name in sorted(self.totals)
        }


@contextlib.contextmanager
def device_trace(out_dir: str) -> Iterator[None]:
    """Dump an XLA/TPU trace viewable in TensorBoard (`--profile` CLI flag)."""
    with jax.profiler.trace(out_dir):
        yield
