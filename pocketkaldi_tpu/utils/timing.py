"""Structured per-stage timing + profiling hooks.

Replaces the reference's ad-hoc ``clock()`` prints (pocketkaldi.cc:186-218,
decoder.cc:42-75) with accumulating stage timers, and exposes an optional
``jax.profiler`` trace context for TPU profiling (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


class StageTimers:
    """Accumulates wall-time per named stage across calls."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()

    def report(self) -> str:
        """Stage report in the reference's style ('Fbank: Xms', etc.)."""
        lines = []
        for name, total in self.totals.items():
            lines.append(f"{name}: {total * 1e3:.3f}ms "
                         f"(n={self.counts[name]})")
        return "\n".join(lines)


@contextlib.contextmanager
def profiler_trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace wrapper (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
