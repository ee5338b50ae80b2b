"""Native (C++) host kernels.

Currently: exact optimal transport (``transport.cpp``), loaded through
ctypes. The shared library is compiled on demand with g++ if no prebuilt
``libtransport.so`` sits next to the source; all callers fall back to pure
Python/scipy implementations when neither is possible.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libtransport.so")
_SRC_PATH = os.path.join(_HERE, "transport.cpp")

_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC_PATH],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.emd_dense.restype = ctypes.c_double
        lib.emd_dense.argtypes = [
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    except Exception:
        _load_failed = True
        _lib = None
    return _lib


def have_native_transport() -> bool:
    return _load() is not None


def emd_dense(a: np.ndarray, b: np.ndarray, cost: np.ndarray) -> float | None:
    """Exact EMD via the native solver; None if unavailable or failed."""
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    cost = np.ascontiguousarray(cost, np.float64)
    n1, n2 = cost.shape
    dp = ctypes.POINTER(ctypes.c_double)
    val = lib.emd_dense(
        n1,
        n2,
        a.ctypes.data_as(dp),
        b.ctypes.data_as(dp),
        cost.ctypes.data_as(dp),
        None,
    )
    return float(val) if val >= 0.0 else None
