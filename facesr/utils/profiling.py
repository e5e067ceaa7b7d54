"""Tracing / profiling helpers (SURVEY.md §5: the reference's only tracing
is wall-clock latency with CUDA sync; the TPU equivalents are jax.profiler
traces plus reliable device-sync timing).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["Timer", "sync_value", "trace"]


def sync_value(x) -> float:
    """Force execution and return a scalar. On tunneled TPU runtimes
    `block_until_ready` can return early; fetching a scalar result is the
    reliable synchronization point (used by bench.py and the latency CLI)."""
    return float(x)


class Timer:
    """Wall-clock timer accumulating laps; `with timer: ...` per lap."""

    def __init__(self):
        self.laps: list[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.laps.append(time.perf_counter() - self._t0)
        return False

    @property
    def total(self) -> float:
        return sum(self.laps)

    @property
    def mean(self) -> float:
        return self.total / len(self.laps) if self.laps else 0.0

    def summary(self) -> dict:
        import numpy as np

        arr = np.asarray(self.laps) if self.laps else np.zeros(1)
        return {
            "mean_ms": float(arr.mean() * 1000),
            "min_ms": float(arr.min() * 1000),
            "max_ms": float(arr.max() * 1000),
            "p50_ms": float(np.percentile(arr, 50) * 1000),
            "count": len(self.laps),
        }


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_trace: bool = False) -> Iterator[None]:
    """jax.profiler trace context (view in TensorBoard / xprof).

    Thin passthrough to jax.profiler.trace, kept for the facesr.utils
    surface; `create_perfetto_trace=True` is the path that works on the
    axon dev tunnel (parse vm.trace.json.gz offline — CLAUDE.md)."""
    with jax.profiler.trace(log_dir,
                            create_perfetto_trace=create_perfetto_trace):
        yield
