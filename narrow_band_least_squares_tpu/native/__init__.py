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
    # ingest runtime (miniSEED + ring buffer); absent in pre-ingest builds
    try:
        up = ct.POINTER(ct.c_uint8)
        lib.nbls_mseed_scan.restype = ct.c_int
        lib.nbls_mseed_scan.argtypes = [up, ct.c_int64, ip, ip]
        lib.nbls_mseed_decode.restype = ct.c_int64
        lib.nbls_mseed_decode.argtypes = [
            up, ct.c_int64, ct.c_char_p, dp, dp, ip, dp,
            ct.c_int64, ct.c_int64,
        ]
        lib.nbls_ring_create.restype = ct.c_void_p
        lib.nbls_ring_create.argtypes = [ct.c_int64, ct.c_int64]
        lib.nbls_ring_destroy.restype = None
        lib.nbls_ring_destroy.argtypes = [ct.c_void_p]
        # data pointer as c_void_p: the feed path passes ndarray.ctypes.data
        # (a raw address) to skip per-call POINTER construction
        lib.nbls_ring_append.restype = ct.c_int
        lib.nbls_ring_append.argtypes = [
            ct.c_void_p, ct.c_int64, ct.c_int64, ct.c_void_p, ct.c_int64,
        ]
        # hot feed-path calls take raw addresses (c_void_p) so Python can
        # pass ndarray.ctypes.data without building POINTER objects.
        # Registered in its own guard: a pre-round-5 .so (when rebuild is
        # unavailable) lacks the symbol, and failing here would leave
        # every symbol after it without restype/argtypes (c_void_p
        # handles truncated to 32-bit c_int — memory corruption, not a
        # clean fallback).
        try:
            lib.nbls_ring_append_batch.restype = ct.c_int64
            lib.nbls_ring_append_batch.argtypes = [
                ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p,
                ct.c_void_p, ct.c_int64,
            ]
        except AttributeError:
            pass
        lib.nbls_ring_base.restype = ct.c_int64
        lib.nbls_ring_base.argtypes = [ct.c_void_p]
        lib.nbls_ring_ready.restype = ct.c_int64
        lib.nbls_ring_ready.argtypes = [ct.c_void_p, ct.c_int64]
        lib.nbls_ring_read.restype = ct.c_int64
        lib.nbls_ring_read.argtypes = [
            ct.c_void_p, ct.c_int64, ct.c_int64, ct.c_double, dp,
        ]
        lib.nbls_ring_release.restype = None
        lib.nbls_ring_release.argtypes = [ct.c_void_p, ct.c_int64]
        lib.nbls_mseed_encode.restype = ct.c_int64
        lib.nbls_mseed_encode.argtypes = [
            ct.c_char_p, ct.c_char_p, ct.c_char_p, ct.c_char_p,
            ct.c_double, ct.c_double, dp, ct.c_int64, up, ct.c_int64,
        ]
    except AttributeError:
        pass
    return lib


def _stale() -> bool:
    if not os.path.exists(_SO):
        return True
    so_mtime = os.path.getmtime(_SO)
    for f in os.listdir(_DIR):
        if f.endswith(".cpp") and os.path.getmtime(os.path.join(_DIR, f)) > so_mtime:
            return True
    return False


def build(force: bool = False) -> bool:
    """Compile the shared object in place; returns success.  Rebuilds when
    any .cpp source is newer than the shared object."""
    if not force and not _stale():
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
    if auto_build and _stale():
        build()
    if os.path.exists(_SO):
        try:
            _lib = _configure(ctypes.CDLL(_SO))
        except OSError:
            _lib = None
    return _lib
