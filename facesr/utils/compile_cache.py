"""Persistent XLA compilation cache for serving restarts.

The AOT artifacts (facesr.ckpt.export) are the zero-compile deployment
path; this is the complementary quality-of-life knob for the
checkpoint-serving path: point every jit at an on-disk cache so a server
restart (or the first request at a new batch/size rung) reuses compiled
programs from previous runs instead of re-invoking XLA. No reference
counterpart (torch has no compile step to cache); TPU-native concern
only.

Call before the first jit executes — JAX snapshots the config at backend
initialization for some platforms, and programs compiled before the call
are not written back.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str) -> str:
    """Enable JAX's persistent compilation cache at `path` (created if
    missing). Caches every program regardless of compile time or size —
    serving processes compile a handful of programs, so the usual
    min-time/min-size thresholds only create confusing misses. Returns
    the absolute cache path."""
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
