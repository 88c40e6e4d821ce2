"""ctypes bridge to the native C++ fast I/O library (native/fast_io.cpp).

Parsing 100M+ line event files and formatting 11-column output dominates
host-side time for large runs; the native library does both with mmap'd
buffers. Every entry point degrades gracefully to `None`/`False` when the
shared library is absent so pure-Python callers always work.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _build(native_dir: str) -> None:
    """Best-effort one-shot build of the shared library via make."""
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", native_dir, "-s"],
            check=False,
            timeout=120,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
    except Exception:
        pass


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    native_dir = os.path.join(here, "native")
    if (
        not os.path.exists(os.path.join(native_dir, "libfarmsio.so"))
        and os.path.exists(os.path.join(native_dir, "fast_io.cpp"))
    ):
        _build(native_dir)
    for cand in (
        os.path.join(native_dir, "libfarmsio.so"),
        os.path.join(os.path.dirname(__file__), "libfarmsio.so"),
    ):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.farms_parse_events.restype = ctypes.c_longlong
                lib.farms_parse_events.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_longlong,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_uint32),
                    ctypes.POINTER(ctypes.c_int32),
                ]
                lib.farms_count_lines.restype = ctypes.c_longlong
                lib.farms_count_lines.argtypes = [ctypes.c_char_p]
                lib.farms_write_flow.restype = ctypes.c_int
                lib.farms_write_flow.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_longlong,
                    ctypes.POINTER(ctypes.c_double),
                ]
                try:
                    lib.farms_pack_compact.restype = ctypes.c_int
                    lib.farms_pack_compact.argtypes = [
                        ctypes.c_longlong,
                        ctypes.POINTER(ctypes.c_int32),
                        ctypes.POINTER(ctypes.c_int32),
                        ctypes.POINTER(ctypes.c_uint32),
                        ctypes.c_uint32,
                        ctypes.c_int32,
                        ctypes.c_int32,
                        ctypes.c_longlong,
                        ctypes.c_longlong,
                        ctypes.c_int32,
                        ctypes.POINTER(ctypes.c_int32),
                    ]
                except AttributeError:
                    # stale library built before pack support; the NumPy
                    # fallback in pipeline/engine.py covers it
                    pass
                _LIB = lib
            except OSError:
                _LIB = None
            break
    return _LIB


def available() -> bool:
    return _lib() is not None


def parse_events(path: str, max_events: int | None) -> np.ndarray | None:
    """Parse `x y t p` text into a float64 [N,4] matrix via the native lib."""
    lib = _lib()
    if lib is None or not os.path.exists(path):
        return None
    cap = lib.farms_count_lines(path.encode())
    if cap < 0:
        return None
    if max_events is not None:
        cap = min(cap, max_events)
    x = np.empty(cap, dtype=np.int32)
    y = np.empty(cap, dtype=np.int32)
    t = np.empty(cap, dtype=np.uint32)
    p = np.empty(cap, dtype=np.int32)
    n = lib.farms_parse_events(
        path.encode(),
        cap,
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n < 0:
        return None
    out = np.empty((n, 4), dtype=np.float64)
    out[:, 0] = x[:n]
    out[:, 1] = y[:n]
    out[:, 2] = t[:n]
    out[:, 3] = p[:n]
    return out


def pack_compact(x: np.ndarray, y: np.ndarray, t: np.ndarray, t0: int,
                 width: int, height: int, m: int, steps: int,
                 subphases: int = 1) -> np.ndarray | None:
    """Native compact device-layout pack (see pipeline/engine.py pack()).

    Returns int32 [steps, 2, m] (row 0: flat pixel index | winner << 30,
    row 1: normalized stamp) or None when the native library is missing,
    in which case the caller's NumPy path applies.
    """
    lib = _lib()
    if lib is None or not hasattr(lib, "farms_pack_compact"):
        return None
    n = int(x.shape[0])
    x = np.ascontiguousarray(x, dtype=np.int32)
    y = np.ascontiguousarray(y, dtype=np.int32)
    t = np.ascontiguousarray(t, dtype=np.uint32)
    out = np.empty((steps, 2, m), dtype=np.int32)
    rc = lib.farms_pack_compact(
        n,
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_uint32(int(t0) & 0xFFFFFFFF),
        width, height, m, steps, subphases,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out if rc == 0 else None


def write_flow(path: str, mat: np.ndarray) -> bool:
    """Write the 11-column matrix via the native formatter."""
    lib = _lib()
    if lib is None:
        return False
    mat = np.ascontiguousarray(mat, dtype=np.float64)
    rc = lib.farms_write_flow(
        path.encode(),
        mat.shape[0],
        mat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return rc == 0
