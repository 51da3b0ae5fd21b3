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
        self.bytes: Dict[str, int] = defaultdict(int)

    def add_bytes(self, name: str, nbytes: int) -> None:
        """Attribute transferred bytes to a stage (fetch/upload stages call
        this so bench windows are self-attributing: a slow window with few
        MB fetched is link congestion, not payload growth)."""
        self.bytes[name] += int(nbytes)

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
        out = {}
        for name in sorted(self.totals):
            entry = {"total_ms": round(self.totals[name] * 1e3, 2),
                     "calls": self.counts[name],
                     "mean_ms": round(
                         self.totals[name] / max(self.counts[name], 1) * 1e3,
                         2)}
            if name in self.bytes:
                entry["mb"] = round(self.bytes[name] / 2**20, 2)
            out[name] = entry
        return out


@contextlib.contextmanager
def device_trace(out_dir: str) -> Iterator[None]:
    """Dump an XLA/TPU trace viewable in TensorBoard (`--profile` CLI flag)."""
    with jax.profiler.trace(out_dir):
        yield
