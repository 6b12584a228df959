"""ctypes bindings for the native runtime components.

The reference has no native layer (SURVEY §2: 100% Python); the framework's
data pipeline is still I/O-bound on large telemetry CSVs (36k-row estimate
tables x 30 trajectories, GPRes grids), so the CSV loader/writer is C++
(native/fastcsv.cpp), bound via ctypes with a transparent numpy fallback
when the shared library hasn't been built. ``build()`` compiles it with the
in-image toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastcsv.so")
_lib = None


def build(force: bool = False) -> bool:
    """Compile libfastcsv.so with make/g++. Returns availability."""
    global _lib
    if not force and os.path.exists(_LIB_PATH):
        return _load() is not None
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return _load() is not None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fastcsv_dims.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_int64),
                                 ctypes.POINTER(ctypes.c_int64)]
    lib.fastcsv_dims.restype = ctypes.c_int
    lib.fastcsv_load.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_double),
                                 ctypes.c_int64]
    lib.fastcsv_load.restype = ctypes.c_int64
    lib.fastcsv_write.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_double),
                                  ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int]
    lib.fastcsv_write.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_csv(path: str, skiprows: int = 1) -> np.ndarray:
    """Numeric CSV -> (rows, cols) float64 array. Native when built,
    numpy.loadtxt otherwise; identical results for well-formed files."""
    lib = _load()
    if lib is None:
        return np.loadtxt(path, delimiter=",", skiprows=skiprows, ndmin=2)
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.fastcsv_dims(path.encode(), skiprows, ctypes.byref(rows),
                          ctypes.byref(cols))
    if rc != 0:
        raise FileNotFoundError(path)
    r, c = rows.value, cols.value
    out = np.empty(r * c, np.float64)
    n = lib.fastcsv_load(path.encode(), skiprows,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                         r * c)
    if n != r * c:
        # ragged file — defer to numpy's stricter parser for the error
        return np.loadtxt(path, delimiter=",", skiprows=skiprows, ndmin=2)
    return out.reshape(r, c)


def write_csv(path: str, data: np.ndarray, header: str = "",
              precision: int = 17) -> None:
    lib = _load()
    d = np.ascontiguousarray(np.atleast_2d(np.asarray(data, np.float64)))
    if lib is None:
        np.savetxt(path, d, delimiter=",", header=header, comments="")
        return
    rc = lib.fastcsv_write(path.encode(), header.encode(),
                           d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                           d.shape[0], d.shape[1], precision)
    if rc != 0:
        raise OSError(f"fastcsv_write failed for {path}")
