"""Profiling helpers: XLA traces + host-side stage timing.

The reference has no profiling surface at all (SURVEY.md §5); here every
entry point can wrap work in ``trace()`` (a ``jax.profiler`` trace context
that produces TensorBoard-loadable traces) and ``StageTimer`` (host-side
per-stage wall-clock accounting with a one-line report).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """``with trace("/tmp/trace"):`` — captures a jax.profiler trace when a
    directory is given; no-op when None (so call sites need no branching)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class StageTimer:
    """Accumulates wall-clock per named stage.

    with timer.stage("tokenize"): ...
    print(timer.report())
    """

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

    def report(self) -> str:
        parts = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            parts.append(f"{name}: {t:.3f}s/{n} ({1000 * t / max(n, 1):.2f} ms each)")
        return " | ".join(parts)

    def reset(self):
        self.totals.clear()
        self.counts.clear()
