"""Utilities: timing, profiling, device sync helpers."""

from facesr.utils.profiling import Timer, sync_value, trace

__all__ = ["Timer", "sync_value", "trace"]
