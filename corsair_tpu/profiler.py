"""Phase timers + throughput meter + jax.profiler integration.

The reference has no tracing at all (SURVEY §5.1, only tqdm bars); this
provides the built-in observability the TPU framework needs: wall-clock
phase timers (with device sync), a pclouds/sec throughput meter, and
optional XLA trace capture via ``jax.profiler``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class PhaseTimer:
    """Accumulates wall-clock per named phase; syncs device on exit."""

    def __init__(self, sync: bool = True):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self.sync = sync

    @contextlib.contextmanager
    def phase(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                import jax
                jax.effects_barrier()
            dt = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = ["phase timings:"]
        for name, total in sorted(
            self.totals.items(), key=lambda kv: -kv[1]
        ):
            n = self.counts[name]
            lines.append(
                f"  {name}: {total:.3f}s total, {n} calls, "
                f"{total / n * 1000:.1f}ms/call"
            )
        return "\n".join(lines)


class ThroughputMeter:
    """pclouds/sec over a sliding window."""

    def __init__(self):
        self.t0: Optional[float] = None
        self.items = 0

    def start(self):
        self.t0 = time.perf_counter()
        self.items = 0

    def add(self, n: int = 1):
        if self.t0 is None:
            self.start()
        self.items += n

    @property
    def rate(self) -> float:
        if self.t0 is None or self.items == 0:
            return 0.0
        return self.items / (time.perf_counter() - self.t0)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/corsair_trace"):
    """Capture an XLA profiler trace around a code block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
