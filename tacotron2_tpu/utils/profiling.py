"""Tracing / profiling hooks (SURVEY §5.1: the reference has none; the
rebuild adds jax.profiler traces + per-phase wall timing)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class PhaseTimer:
    """Accumulates wall time per named phase; cheap enough to leave on."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            mean_ms = 1e3 * self.totals[name] / max(self.counts[name], 1)
            lines.append(
                f"{name}: {self.totals[name]:.2f}s total, {self.counts[name]}x, {mean_ms:.1f}ms avg"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """XLA/TPU profiler trace (view in TensorBoard's profile plugin /
    xprof). No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
