"""Native (C++) host-side runtime components, bound via ctypes.

The compute path is JAX/XLA/Pallas; the host runtime around it uses native
code where the reference relied on native library internals (torch
DataLoader workers / OpenCV). `batch_assembler` fuses the loader's
crop + flip + normalize + stack into one parallel C++ pass.

The shared library is compiled on first use with g++ (cached next to the
source); every entry point degrades to a numpy fallback when no toolchain
is available, so the framework never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

__all__ = ["assemble_hr_batch", "native_available", "get_lib"]

_SRC = os.path.join(os.path.dirname(__file__), "batch_assembler.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libbatch_assembler.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", _LIB, _SRC],
            check=True, capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError) as e:
        print(f"facesr.native: build failed ({e}); using numpy fallback")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            src_mtime = os.path.getmtime(_SRC) if os.path.exists(_SRC) else 0
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < src_mtime:
                if not os.path.exists(_SRC):  # packaged .so without source
                    if not os.path.exists(_LIB):
                        return None
                elif not _build():
                    return None
            lib = ctypes.CDLL(_LIB)
        except OSError as e:  # unloadable .so (ABI mismatch, partial build)
            print(f"facesr.native: cannot load {_LIB} ({e}); numpy fallback")
            return None
        lib.assemble_hr_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),   # imgs
            ctypes.POINTER(ctypes.c_int32),    # heights
            ctypes.POINTER(ctypes.c_int32),    # widths
            ctypes.c_int32,                    # n
            ctypes.c_int32,                    # crop
            ctypes.POINTER(ctypes.c_int32),    # top
            ctypes.POINTER(ctypes.c_int32),    # left
            ctypes.POINTER(ctypes.c_uint8),    # flip
            ctypes.POINTER(ctypes.c_float),    # out
            ctypes.c_int32,                    # nthreads
        ]
        lib.assemble_hr_batch.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def assemble_hr_batch(
    images: Sequence[np.ndarray],
    crop: int,
    tops: np.ndarray,
    lefts: np.ndarray,
    flips: np.ndarray,
    nthreads: int = 0,
) -> np.ndarray:
    """Crop+flip+normalize+stack HWC uint8 RGB images -> [N, crop, crop, 3]
    float32 in [0,1]. Falls back to numpy when the native lib is missing."""
    n = len(images)
    for i, img in enumerate(images):
        # the native kernel reads h*w*3 raw uint8 bytes — anything else
        # (grayscale, float, padded strides) would be an out-of-bounds or
        # garbage read, so validate BOTH paths identically here
        if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
            raise ValueError(
                f"image {i} must be HWC uint8 RGB, got "
                f"shape={img.shape} dtype={img.dtype}")
        h, w = img.shape[:2]
        t, l = int(tops[i]), int(lefts[i])
        if t < 0 or l < 0 or t + crop > h or l + crop > w:
            raise ValueError(
                f"image {i} ({h}x{w}) cannot supply a {crop}px crop at "
                f"({t},{l})"
            )
    lib = get_lib()
    if lib is None:
        out = np.empty((n, crop, crop, 3), np.float32)
        for i, img in enumerate(images):
            t, l = int(tops[i]), int(lefts[i])
            patch = img[t:t + crop, l:l + crop]
            if flips[i]:
                patch = patch[:, ::-1]
            out[i] = patch.astype(np.float32) / 255.0
        return out

    images = [np.ascontiguousarray(img) for img in images]
    ptrs = (ctypes.c_void_p * n)(*[img.ctypes.data for img in images])
    heights = np.asarray([img.shape[0] for img in images], np.int32)
    widths = np.asarray([img.shape[1] for img in images], np.int32)
    tops = np.ascontiguousarray(tops, np.int32)
    lefts = np.ascontiguousarray(lefts, np.int32)
    flips = np.ascontiguousarray(flips, np.uint8)
    out = np.empty((n, crop, crop, 3), np.float32)
    if nthreads <= 0:
        nthreads = min(os.cpu_count() or 1, n)
    lib.assemble_hr_batch(
        ptrs,
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        crop,
        tops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nthreads,
    )
    return out
