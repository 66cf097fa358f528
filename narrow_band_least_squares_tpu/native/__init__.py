"""ctypes loader for the native runtime pieces (C++; optional).

Build with ``make -C narrow_band_least_squares_tpu/native`` (pure g++, no
pybind11).  Everything here degrades gracefully: if the shared object is
missing or fails to load, callers fall back to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libnbls_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _configure(lib: ctypes.CDLL) -> ctypes.CDLL:
    import ctypes as ct

    dp = ct.POINTER(ct.c_double)
    ip = ct.POINTER(ct.c_int64)
    lib.nbls_write_tsv.restype = ct.c_int
    lib.nbls_write_tsv.argtypes = [
        ct.c_char_p, dp, dp, dp, dp, dp, ip, ct.c_int64, ct.c_int64,
    ]
    lib.nbls_count_tsv_rows.restype = ct.c_int64
    lib.nbls_count_tsv_rows.argtypes = [ct.c_char_p]
    lib.nbls_read_tsv.restype = ct.c_int64
    lib.nbls_read_tsv.argtypes = [
        ct.c_char_p, dp, dp, dp, dp, dp, dp, ct.c_int64,
    ]
    return lib


def build(force: bool = False) -> bool:
    """Compile the shared object in place; returns success."""
    if os.path.exists(_SO) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"], check=True, capture_output=True
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried and not auto_build:
        return None
    _tried = True
    if not os.path.exists(_SO) and auto_build:
        build()
    if os.path.exists(_SO):
        try:
            _lib = _configure(ctypes.CDLL(_SO))
        except OSError:
            _lib = None
    return _lib
