"""Tracing / profiling helpers.

The reference's observability is wall-clock prints
(infer_effocr_onnx_multi.py:394-395) and a commented line_profiler hook
(:226).  TPU-native: jax.profiler traces (viewable in Perfetto/TensorBoard)
plus honest per-stage timers that block on device completion.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating per-stage wall timers; block_until_ready for honesty."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def reset(self) -> None:
        """Drop accumulated stats (e.g. after compile/warmup passes, so a
        report covers only the timed region)."""
        self.totals.clear()
        self.counts.clear()

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(
                f"{name:24s} {t:8.3f}s total  {t / max(n, 1) * 1e3:8.2f}ms/call"
                f"  x{n}"
            )
        return "\n".join(lines)
