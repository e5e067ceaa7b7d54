"""Utilities: timing, profiling, device sync, compile-cache helpers."""

from facesr.utils.compile_cache import enable_compile_cache
from facesr.utils.profiling import Timer, sync_value, trace

__all__ = ["Timer", "sync_value", "trace", "enable_compile_cache"]
