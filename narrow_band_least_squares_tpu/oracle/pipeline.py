"""CPU oracle for the narrow-band orchestrator.

Reproduces reference ``narrow_band_least_squares.py:8-127`` (sequential path)
on an ArrayStream: per band, filter -> sosfreqz -> BT check -> ltsva ->
dense-prefix writes, with the reference's ``vector_len`` heuristic and the
``"NN_"`` stdict key prefixes.  Used as the golden reference for the batched
TPU pipeline and as the CPU baseline for benchmarks.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
from scipy import signal

from narrow_band_least_squares_tpu.io.stream import ArrayStream
from narrow_band_least_squares_tpu.oracle.ltsva import (
    filter_and_taper,
    sliding_window_solve,
)
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import (
    band_edges,
    reference_vector_len,
)


def narrow_band_least_squares_oracle(
    WINLEN_list: Sequence[float],
    WINOVER: float,
    ALPHA: float,
    st: ArrayStream,
    lat_list: Sequence[float],
    lon_list: Sequence[float],
    NBANDS: int,
    freqlist: Sequence[float],
    FREQ_BAND_TYPE: str,
    freq_resp_list: np.ndarray,
    FILTER_TYPE: str,
    FILTER_ORDER: int,
    FILTER_RIPPLE: float,
    verbose: bool = False,
):
    """Sequential narrow-band processing, reference tuple contract.

    Returns ``(vel_array, baz_array, mdccm_array, t_array, stdict_all,
    sig_tau_array, num_compute_list, w_array, h_array)`` like reference
    ``narrow_band_least_squares.py:127``.
    """
    npts = st.npts
    Fs = st.fs
    vector_len = reference_vector_len(WINLEN_list, WINOVER, npts, Fs)
    rij = get_rij(list(lat_list), list(lon_list), st.nchans)

    # Dense width: the reference np.empty((NBANDS, vector_len)) contract;
    # widened when a band legitimately produces more windows than the quirky
    # heuristic allows (never the case for the canonical configs).
    width = vector_len
    nresp = len(freq_resp_list)

    vel_rows: List[np.ndarray] = []
    baz_rows: List[np.ndarray] = []
    mdccm_rows: List[np.ndarray] = []
    t_rows: List[np.ndarray] = []
    sig_rows: List[np.ndarray] = []
    num_compute_list: List[int] = []
    stdict_all: Optional[Dict[str, object]] = {}
    w_array = np.zeros((NBANDS, nresp), dtype=complex)
    h_array = np.zeros((NBANDS, nresp), dtype=complex)

    for ii in range(NBANDS):
        tempfmin, tempfmax = band_edges(freqlist, ii, FREQ_BAND_TYPE)
        filtered, sos = filter_and_taper(
            st.data, Fs, FILTER_TYPE, tempfmin, tempfmax,
            FILTER_ORDER, FILTER_RIPPLE,
        )
        w, h = signal.sosfreqz(sos, freq_resp_list, fs=Fs)
        w_array[ii, :] = w
        h_array[ii, :] = h

        temp_BT = WINLEN_list[ii] * (tempfmax - tempfmin)
        if temp_BT < 5.0 and verbose:
            print(
                f"CAUTION: BT < 5! Band between {tempfmin} Hz and {tempfmax} "
                f"Hz has BT = {temp_BT}"
            )

        res = sliding_window_solve(
            filtered, rij, Fs, st.start_epoch,
            WINLEN_list[ii], WINOVER, ALPHA,
        )
        n = len(res["vel"])
        width = max(width, n)
        vel_rows.append(res["vel"])
        baz_rows.append(res["baz"])
        mdccm_rows.append(res["mdccm"])
        t_rows.append(res["t"])
        sig_rows.append(res["sig_tau"])
        num_compute_list.append(n)

        if ALPHA == 1.0:
            stdict_all = None
        else:
            # zero-padded band prefix "NN_" on every timestamp key
            # (reference narrow_band_least_squares.py:114-124)
            temp = {}
            for key, val in res["stdict"].items():
                if key != "size":
                    temp[str(ii + 1).zfill(2) + "_" + key] = val
                else:
                    temp["size"] = val
            stdict_all = {**stdict_all, **temp}

    vel_array = np.zeros((NBANDS, width))
    baz_array = np.zeros((NBANDS, width))
    mdccm_array = np.zeros((NBANDS, width))
    t_array = np.zeros((NBANDS, width))
    sig_tau_array = np.zeros((NBANDS, width))
    for ii in range(NBANDS):
        n = num_compute_list[ii]
        vel_array[ii, :n] = vel_rows[ii]
        baz_array[ii, :n] = baz_rows[ii]
        mdccm_array[ii, :n] = mdccm_rows[ii]
        t_array[ii, :n] = t_rows[ii]
        sig_tau_array[ii, :n] = sig_rows[ii]

    return (
        vel_array, baz_array, mdccm_array, t_array, stdict_all,
        sig_tau_array, num_compute_list, w_array, h_array,
    )
