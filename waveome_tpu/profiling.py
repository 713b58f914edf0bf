"""Profiling / tracing hooks.

The reference's only observability is wall-clock prints
(model_search.py:505-512; SURVEY.md §5.1). Here profiling is first-class:
phase timers with a structured report, and ``jax.profiler`` trace capture
for TPU timeline analysis (view with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulating named-phase wall-clock timer."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k],
                "mean_s": round(v / self.counts[k], 4)}
            for k, v in sorted(self.totals.items(),
                               key=lambda kv: -kv[1])
        }

    def print_report(self) -> None:
        print(json.dumps(self.report(), indent=2))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/waveome_tpu_trace"):
    """Capture a jax.profiler trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Optional[dict]:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
