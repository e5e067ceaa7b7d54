"""Tracing / profiling helpers (SURVEY.md §5: the reference's only tracing
is wall-clock latency with CUDA sync; the TPU equivalents are jax.profiler
traces plus reliable device-sync timing).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["Timer", "sync_value", "trace", "memory_report", "format_memory_report"]


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


def memory_report(jitted_fn, *args) -> dict:
    """Per-device HBM budget of a jitted function via XLA's buffer
    assignment (AOT lower -> compile -> CompiledMemoryStats), WITHOUT
    executing it. The reference has no equivalent (its OOMs are runtime
    CUDA errors); on TPU the whole step is one XLA program, so its memory
    is fully known at compile time — this is how the dp vs tp/pp per-chip
    footprint claims are made concrete (docs/parallelism.md).

    Accepts jax.Array or jax.ShapeDtypeStruct (optionally with .sharding)
    arguments. Returns a dict of byte counts (per device under SPMD):
    arguments (params/optimizer/batch shards), outputs, temps (live
    intermediates incl. the backward's stash), peak, and generated code.

    Note: the AOT compile does not populate the jit's dispatch cache, so
    calling this adds one extra compilation of the step.
    """
    compiled = jitted_fn.lower(*args).compile()
    ma = compiled.memory_analysis()
    fields = [
        "argument_size_in_bytes", "output_size_in_bytes",
        "temp_size_in_bytes", "alias_size_in_bytes",
        "generated_code_size_in_bytes", "peak_memory_in_bytes",
    ]
    report = {f: int(getattr(ma, f, 0) or 0) for f in fields}
    # The backend's peak counter is unreliable on some platforms (the CPU
    # backend reports less than the temp total); the sum of components is
    # the defensible budget — everything simultaneously resident if XLA
    # overlaps nothing. Donated inputs (the train steps donate their
    # TrainState) appear in BOTH arguments and outputs but occupy one
    # buffer — alias_size_in_bytes removes the double count.
    report["total_budget_in_bytes"] = (
        report["argument_size_in_bytes"] + report["output_size_in_bytes"]
        + report["temp_size_in_bytes"] - report["alias_size_in_bytes"])
    return report


def format_memory_report(report: dict, label: str = "step") -> str:
    mb = lambda b: f"{b / (1 << 20):8.1f} MB"
    return (f"[{label}] per-device HBM (XLA buffer assignment):\n"
            f"  arguments  {mb(report['argument_size_in_bytes'])}"
            f"  (state + batch shards)\n"
            f"  outputs    {mb(report['output_size_in_bytes'])}\n"
            f"  temps      {mb(report['temp_size_in_bytes'])}"
            f"  (live intermediates incl. backward stash)\n"
            f"  budget     {mb(report['total_budget_in_bytes'])}"
            f"  (arguments + outputs + temps - donated aliases)")
