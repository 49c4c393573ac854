"""ctypes bindings + build for the native loader (runtime/loader.cpp).

Builds the shared library on first use (g++, links libpng/z) and caches it
next to the source.  Falls back gracefully: callers should catch
``NativeUnavailable`` and use the Python/cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_LIB = os.path.join(_HERE, "libuavloader.so")

_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-lpng", "-lz", "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
    except Exception as e:  # pragma: no cover
        raise NativeUnavailable(str(e))

    lib.uav_decode_pngs.restype = ctypes.c_int
    lib.uav_decode_pngs.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    lib.uav_parse_csv.restype = ctypes.c_int64
    lib.uav_parse_csv.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    _lib = lib
    return lib


def decode_pngs(paths, height, width, threads=None):
    """Decode grayscale PNGs into one (N, H, W) uint8 array, multithreaded."""
    lib = get_lib()
    n = len(paths)
    out = np.empty((n, height, width), np.uint8)
    status = np.zeros(n, np.int32)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    offsets = np.zeros(n, np.int64)
    off = 0
    for i, p in enumerate(paths):
        offsets[i] = off
        off += len(p.encode()) + 1
    threads = threads or min(os.cpu_count() or 4, 16)
    fails = lib.uav_decode_pngs(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height, width, threads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if fails:
        bad = [paths[i] for i in np.nonzero(status)[0][:3]]
        raise IOError(f"{fails} PNG decodes failed (e.g. {bad})")
    return out


def parse_csv(path, cols, scale=1e-9, max_rows=2_000_000):
    """Parse a EuRoC CSV into (timestamps, values[rows, cols])."""
    lib = get_lib()
    ts = np.empty(max_rows, np.float64)
    vals = np.empty((max_rows, cols), np.float64)
    n = lib.uav_parse_csv(
        path.encode(), cols, scale,
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_rows,
    )
    if n < 0:
        raise IOError(f"csv parse failed ({n}): {path}")
    return ts[:n].copy(), vals[:n].copy()
