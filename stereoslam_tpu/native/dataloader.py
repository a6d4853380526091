"""ctypes binding for the C++ prefetching stereo loader.

Builds ``libslamloader.so`` on first use (g++ + libpng, both baked into the
target image); falls back with ImportError if the toolchain is missing so
callers can use the Python thread-pool path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libslamloader.so")
_lib = None


def _build() -> None:
    subprocess.run(
        ["make", "-C", _DIR, "libslamloader.so"],
        check=True,
        capture_output=True,
    )


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_DIR, "dataloader.cpp")
    ):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.loader_probe_dims.restype = ctypes.c_int
    lib.loader_probe_dims.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def stream_pairs(
    left_paths: Sequence[str],
    right_paths: Sequence[str],
    timestamps: Sequence[float],
    prefetch: int = 4,
    n_threads: int = 2,
) -> Iterator[Tuple[np.ndarray, np.ndarray, float]]:
    """Yield decoded (left, right, timestamp) tuples with async prefetch."""
    lib = _load()
    n = len(left_paths)
    if n == 0:
        return
    h0 = ctypes.c_int()
    w0 = ctypes.c_int()
    if lib.loader_probe_dims(left_paths[0].encode(), ctypes.byref(h0), ctypes.byref(w0)) != 0:
        raise IOError(f"cannot decode {left_paths[0]}")
    H, W = h0.value, w0.value

    larr = (ctypes.c_char_p * n)(*[p.encode() for p in left_paths])
    rarr = (ctypes.c_char_p * n)(*[p.encode() for p in right_paths])
    handle = lib.loader_create(larr, rarr, n, prefetch, n_threads)
    try:
        for _ in range(n):
            left = np.empty((H, W), np.uint8)
            right = np.empty((H, W), np.uint8)
            h = ctypes.c_int()
            w = ctypes.c_int()
            idx = lib.loader_next(
                handle,
                left.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                right.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.byref(h),
                ctypes.byref(w),
            )
            if idx == -1:
                return
            if idx == -2:
                continue  # decode error: skip frame
            yield left, right, float(timestamps[idx])
    finally:
        lib.loader_destroy(handle)
