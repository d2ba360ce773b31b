"""Profiling & step metrics (SURVEY.md §5.1).

The reference only has commented-out wall-clock probes
(tasks/base_task.py:201-293) and CUDA max-memory prints.  Here they are
first-class: a phase timer that aggregates per-step host timings, a
``jax.profiler`` trace context, and device memory stats.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class StepTimer:
    """Named phase timings per step (data/prep/step/log...)."""

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

    def summary(self) -> Dict[str, float]:
        return {
            name: self.totals[name] / max(self.counts[name], 1)
            for name in self.totals
        }

    def log(self, prefix: str = "phase timings") -> None:
        parts = ", ".join(f"{k}: {v * 1e3:.1f}ms" for k, v in self.summary().items())
        logging.info("%s: %s", prefix, parts)


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """``jax.profiler`` trace when a log dir is configured, else a no-op."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info("profiler trace written to %s", log_dir)


def device_memory_stats() -> Dict[str, float]:
    """Peak/current HBM use in MiB (TPU equivalent of cuda max-memory)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        mib = 1024 * 1024
        return {
            "bytes_in_use_mib": stats.get("bytes_in_use", 0) / mib,
            "peak_bytes_in_use_mib": stats.get("peak_bytes_in_use", 0) / mib,
            "bytes_limit_mib": stats.get("bytes_limit", 0) / mib,
        }
    except Exception:  # pragma: no cover - backend-dependent
        return {}
