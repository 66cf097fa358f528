"""Flat-text results persistence (the reference's checkpoint format).

Byte-compatible with reference ``helpers.py:161-235``: a TSV with header
``Fmin Fmax Time Trace_vel Backaz MdCCM`` and one row per (band, valid
window); reading reconstructs the band list from unique Fmin values and the
ragged per-band row counts from index differences, re-packing into dense
``(nbands, vector_len)`` arrays.  This append/restart workflow is the
reference's de-facto checkpoint/resume mechanism for weeks/months monitoring
(SURVEY §3.5); `models.streaming` builds on it.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def write_txtfile(
    save_dir: str,
    fname: str,
    vel_array: np.ndarray,
    baz_array: np.ndarray,
    mdccm_array: np.ndarray,
    t_array: np.ndarray,
    freqlist: Sequence[float],
    num_compute_list: Sequence[int],
    verbose: bool = False,
    use_native: bool = True,
) -> str:
    """Write results as TSV; returns the path written.

    Same layout as reference ``helpers.py:161-182``: header line, then
    ``num_compute_list[b]`` rows per band of
    ``Fmin Fmax Time Trace_vel Backaz MdCCM``.  Uses the C++ codec
    (native/textio.cpp) when built — the Python row loop dominates host
    time at monitoring scale — with identical bytes either way.

    Written ATOMICALLY (temp file + ``os.replace``): the monitor's
    resume scan treats an existing .txt as segment-complete, so a
    process dying mid-write must never leave a truncated file that
    would be skipped forever with partial data.
    """
    os.makedirs(save_dir or ".", exist_ok=True)
    path = os.path.join(save_dir, fname + ".txt")
    tmp = path + ".tmp"

    if use_native and not verbose:
        out = _write_native(
            tmp, vel_array, baz_array, mdccm_array, t_array,
            freqlist, num_compute_list,
        )
        if out:
            os.replace(tmp, path)
            return path
    with open(tmp, "w") as f:
        f.write("Fmin \t Fmax \t Time \t Trace_vel \t Backaz \t MdCCM \n")
        for ii in range(len(num_compute_list)):
            if verbose:
                print(num_compute_list[ii])
            for jj in range(int(num_compute_list[ii])):
                f.write(
                    str(freqlist[ii]) + "\t" + str(freqlist[ii + 1]) + "\t"
                    + str(t_array[ii, jj]) + "\t" + str(vel_array[ii, jj]) + "\t"
                    + str(baz_array[ii, jj]) + "\t" + str(mdccm_array[ii, jj]) + "\n"
                )
    os.replace(tmp, path)
    return path


def _write_native(path, vel_array, baz_array, mdccm_array, t_array,
                  freqlist, num_compute_list) -> str | None:
    """C++ fast path; returns the path on success, None to fall back."""
    try:
        from narrow_band_least_squares_tpu.native import get_lib
    except ImportError:
        return None
    lib = get_lib()
    if lib is None:
        return None
    import ctypes as ct

    nbands = len(num_compute_list)
    vel = np.ascontiguousarray(vel_array, dtype=np.float64)
    baz = np.ascontiguousarray(baz_array, dtype=np.float64)
    mdccm = np.ascontiguousarray(mdccm_array, dtype=np.float64)
    t = np.ascontiguousarray(t_array, dtype=np.float64)
    fl = np.ascontiguousarray(np.asarray(freqlist, dtype=np.float64))
    nc = np.ascontiguousarray(np.asarray(num_compute_list, dtype=np.int64))
    width = vel.shape[1]
    dp = ct.POINTER(ct.c_double)
    ip = ct.POINTER(ct.c_int64)
    rc = lib.nbls_write_tsv(
        path.encode(), fl.ctypes.data_as(dp), t.ctypes.data_as(dp),
        vel.ctypes.data_as(dp), baz.ctypes.data_as(dp),
        mdccm.ctypes.data_as(dp), nc.ctypes.data_as(ip),
        ct.c_int64(nbands), ct.c_int64(width),
    )
    return path if rc == 0 else None


def _read_native(path: str):
    """C++ fast parse of the 6 columns; returns (nrows, cols) or None."""
    try:
        from narrow_band_least_squares_tpu.native import get_lib
    except ImportError:
        return None
    lib = get_lib()
    if lib is None:
        return None
    import ctypes as ct

    n = lib.nbls_count_tsv_rows(path.encode())
    if n <= 0:
        return None
    cols = [np.empty(n, dtype=np.float64) for _ in range(6)]
    dp = ct.POINTER(ct.c_double)
    got = lib.nbls_read_tsv(
        path.encode(), *[c.ctypes.data_as(dp) for c in cols], ct.c_int64(n)
    )
    if got != n:
        return None
    return cols


def read_txtfile(save_dir: str, fname: str, use_native: bool = True):
    """Inverse of write_txtfile (reference ``helpers.py:185-235``).

    Returns ``(vel_array, baz_array, mdccm_array, t_array, freqlist,
    num_compute_list, nbands, FMIN, FMAX)``; dense arrays are
    ``(nbands, vector_len)`` with only the per-band prefix valid.
    """
    path = os.path.join(save_dir, fname + ".txt")
    native = _read_native(path) if use_native else None
    if native is not None:
        temp_file = np.stack(native, axis=1)
    else:
        temp_file = np.genfromtxt(path, skip_header=1, dtype="float")
    temp_file = np.atleast_2d(temp_file)

    fmin_list = temp_file[:, 0]
    fmax_temp = temp_file[-1, 1]
    unique_freq, idx = np.unique(fmin_list, return_index=True)
    freqlist = np.append(unique_freq, fmax_temp)
    idx = np.append(idx, len(fmin_list))
    num_compute_list = np.diff(idx)
    FMIN = fmin_list[0]
    FMAX = fmax_temp

    # vector_len recovered from the final band's row count (helpers.py:212)
    vector_len = len(fmin_list) - idx[-2]
    nbands = len(freqlist) - 1
    vel_array = np.zeros((nbands, vector_len))
    baz_array = np.zeros((nbands, vector_len))
    mdccm_array = np.zeros((nbands, vector_len))
    t_array = np.zeros((nbands, vector_len))

    t_list = temp_file[:, 2]
    vel_list = temp_file[:, 3]
    baz_list = temp_file[:, 4]
    mdccm_list = temp_file[:, 5]

    for ii in range(nbands):
        a, b = idx[ii], idx[ii + 1]
        n = b - a
        vel_array[ii, :n] = vel_list[a:b]
        baz_array[ii, :n] = baz_list[a:b]
        mdccm_array[ii, :n] = mdccm_list[a:b]
        t_array[ii, :n] = t_list[a:b]

    return (
        vel_array, baz_array, mdccm_array, t_array,
        freqlist, num_compute_list, nbands, FMIN, FMAX,
    )
