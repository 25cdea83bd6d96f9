"""ctypes bindings for the native data-ingest extension.

`decode_jpeg_batch(paths, size)` decodes and bicubic-resizes a list of JPEG
files to (N, size, size, 3) uint8 using the multithreaded C++ extension
(native/jpeg_loader.cpp, built by tools/build_native.py). Falls back to
PIL when the extension isn't built — callers can treat this module as
always-available.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_SO_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "libflowerjpeg.so")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and os.path.exists(_SO_PATH):
        lib = ctypes.CDLL(_SO_PATH)
        lib.flowerdiff_decode_batch.restype = ctypes.c_int
        lib.flowerdiff_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # paths
            ctypes.c_int,                     # n
            ctypes.c_int,                     # size
            ctypes.POINTER(ctypes.c_uint8),   # out
            ctypes.POINTER(ctypes.c_uint8),   # status
            ctypes.c_int,                     # n_threads
        ]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def decode_jpeg_batch(
    paths: List[str], size: int, n_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (images uint8 (N, size, size, 3), ok bool (N,))."""
    lib = _load()
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    status = np.zeros((n,), np.uint8)
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        lib.flowerdiff_decode_batch(
            c_paths, n, size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_threads,
        )
        return out, status.astype(bool)

    from PIL import Image  # fallback path

    for i, path in enumerate(paths):
        try:
            with Image.open(path) as img:
                img = img.convert("RGB").resize((size, size), Image.BICUBIC)
                out[i] = np.asarray(img, np.uint8)
                status[i] = 1
        except Exception:
            out[i] = 0
    return out, status.astype(bool)
