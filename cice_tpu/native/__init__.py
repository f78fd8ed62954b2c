"""Native (C) runtime helpers, loaded via ctypes.

The reference's native code is C glue (ice_memusage_gptl.c, makdep.c,
ice_shr_reprosum86.c — SURVEY §2.6/§2.8); the equivalents here are built
on demand with the system compiler into a cached shared object. Pure-Python
fallbacks keep every feature working if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from functools import lru_cache

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_SRC_DIR, "_build")
_SOURCES = ["memusage.c", "reprosum.c", "asyncwriter.c"]


@lru_cache(maxsize=1)
def _lib():
    """Compile (once) and load the native helper library; None on failure."""
    so_path = os.path.join(_BUILD_DIR, "libcice_native.so")
    try:
        srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
        newest_src = max(os.path.getmtime(s) for s in srcs)
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < newest_src:
            os.makedirs(_BUILD_DIR, exist_ok=True)
            cc = os.environ.get("CC", "cc")
            cmd = [cc, "-O2", "-fPIC", "-shared", "-o", so_path, *srcs,
                   "-lm", "-lpthread"]
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.cice_memusage_highwater.restype = ctypes.c_double
        lib.cice_memusage_current.restype = ctypes.c_double
        lib.cice_reprosum.restype = ctypes.c_double
        lib.cice_reprosum.argtypes = [ctypes.POINTER(ctypes.c_double),
                                      ctypes.c_size_t]
        lib.cice_compsum.restype = ctypes.c_double
        lib.cice_compsum.argtypes = [ctypes.POINTER(ctypes.c_double),
                                     ctypes.c_size_t]
        lib.cice_aw_start.restype = ctypes.c_void_p
        lib.cice_aw_start.argtypes = [ctypes.c_int]
        lib.cice_aw_submit.restype = ctypes.c_int
        lib.cice_aw_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_char_p, ctypes.c_size_t]
        lib.cice_aw_flush.restype = ctypes.c_long
        lib.cice_aw_flush.argtypes = [ctypes.c_void_p]
        lib.cice_aw_pending.restype = ctypes.c_long
        lib.cice_aw_pending.argtypes = [ctypes.c_void_p]
        lib.cice_aw_stop.restype = None
        lib.cice_aw_stop.argtypes = [ctypes.c_void_p]
        return lib
    except Exception:
        return None


def memusage_highwater_mb() -> float:
    lib = _lib()
    if lib is not None:
        return float(lib.cice_memusage_highwater())
    import resource
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def memusage_current_mb() -> float:
    lib = _lib()
    if lib is not None:
        return float(lib.cice_memusage_current())
    return -1.0


def reprosum_host(arr) -> float:
    """Order-invariant (bit-reproducible) host sum of a float64 array."""
    import numpy as np
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.float64).ravel())
    lib = _lib()
    if lib is not None:
        ptr = a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        return float(lib.cice_reprosum(ptr, a.size))
    # python fallback: sorted-by-magnitude compensated sum (order invariant)
    idx = np.argsort(np.abs(a), kind="stable")
    import math
    s = c = 0.0
    for v in a[idx]:
        t = s + v
        c += (s - t) + v if abs(s) >= abs(v) else (v - t) + s
        s = t
    return s + c


def compsum_host(arr) -> float:
    import numpy as np
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.float64).ravel())
    lib = _lib()
    if lib is not None:
        ptr = a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        return float(lib.cice_compsum(ptr, a.size))
    return float(np.sum(a))
