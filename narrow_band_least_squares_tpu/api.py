"""Reference-parity public API.

Function-for-function mirror of the reference surface so a user of
``amiezzi/narrow_band_least_squares`` can switch frameworks without changing
call sites:

- ``get_freqlist``/``get_winlenlist``/``get_rij``/``make_float`` and the TSV
  round-trip mirror ``helpers.py``.
- ``filter_data`` mirrors ``helpers.py:108-141`` (ObsPy Stream -> ArrayStream).
- ``ltsva`` mirrors the vendored solver's 8-tuple contract
  (``example.py:109``).
- ``narrow_band_least_squares`` / ``narrow_band_least_squares_parallel``
  mirror ``narrow_band_least_squares.py:8,223`` — both now run the same
  fused batched device computation (band-parallelism is implicit in the
  batch; the joblib process pool has no reason to exist on TPU), kept as two
  names for drop-in compatibility.

Everything here is a thin host-side shim over `models.NarrowBandPipeline`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from narrow_band_least_squares_tpu.io.stream import ArrayStream
from narrow_band_least_squares_tpu.io.textio import read_txtfile, write_txtfile
from narrow_band_least_squares_tpu.models.narrowband import (
    NarrowBandPipeline,
    flags_to_stdict,
)
from narrow_band_least_squares_tpu.ops import filters as _filters
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import (
    get_freqlist,
    get_winlenlist,
    make_plan,
)

__all__ = [
    "get_freqlist",
    "get_winlenlist",
    "get_rij",
    "make_float",
    "filter_data",
    "write_txtfile",
    "read_txtfile",
    "ltsva",
    "narrow_band_least_squares",
    "narrow_band_least_squares_parallel",
    "set_performance_defaults",
    "PRODUCTION_DEFAULTS",
]


import functools

# TPU performance overrides applied to every pipeline this parity surface
# constructs (see set_performance_defaults).
_PERF_DEFAULTS: dict = {}

# The measured production profile: every knob here has a published
# accuracy envelope (confident-window deviations) in the BENCH_*.json
# records — `set_performance_defaults(**PRODUCTION_DEFAULTS)` turns it on
# for the whole reference-parity surface.
#   band_limit_db='auto'  : passband-bin xcorr, BT-sweep-calibrated
#                           threshold (BENCH_BANDLIMIT.json bt_sweep)
#   lts_funnel_k='auto'   : FAST-LTS funnel, max(16, ceil(Q/24))
#                           (BENCH_LTS_FUNNEL.json conf columns)
# v5e: canonical OLS 2.3 -> 1.5 ms, LTS 5.7 -> 3.2 ms, dense50 LTS
# 55.9 -> 26.7 ms.
PRODUCTION_DEFAULTS = {
    "band_limit_db": "auto",
    "lts_funnel_k": "auto",
}


def set_performance_defaults(**kwargs) -> dict:
    """Set TPU tuning knobs for every pipeline the parity API constructs.

    The reference call signatures (`narrow_band_least_squares`, `ltsva`)
    carry no performance options, so this module-level override is the
    drop-in-compatible way to tune them: ``xcorr_method``,
    ``window_method``, ``max_lag_s``, ``matmul_precision``,
    ``lts_funnel_k``, ``lts_candidate_chunk``, ``xcorr_chunk_mb``,
    ``xcorr_lag_tile``,
    ``subsample_delays``, ``bucket_bands``, ``c_steps`` — anything
    `models.NarrowBandPipeline` accepts.  Passing ``None`` for a key
    removes it.  Returns the previous overrides (so callers can restore).
    """
    prev = dict(_PERF_DEFAULTS)
    for k, v in kwargs.items():
        if v is None:
            _PERF_DEFAULTS.pop(k, None)
        else:
            _PERF_DEFAULTS[k] = v
    _cached_pipeline.cache_clear()
    return prev


@functools.lru_cache(maxsize=32)
def _cached_pipeline(plan, rij_key, filter_type, filter_order, filter_ripple,
                     alpha, apply_filter, perf_key):
    rij = np.asarray(rij_key, dtype=np.float64)
    return NarrowBandPipeline(
        plan, rij,
        filter_type=filter_type, filter_order=filter_order,
        filter_ripple=filter_ripple, alpha=alpha, apply_filter=apply_filter,
        **dict(perf_key),
    )


def _get_pipeline(plan, rij, filter_type="cheby1", filter_order=2,
                  filter_ripple=0.01, alpha=1.0, apply_filter=True):
    """Memoize pipelines (and their jit caches) across repeated API calls."""
    rij_key = tuple(tuple(float(v) for v in row) for row in rij)
    perf_key = tuple(sorted(_PERF_DEFAULTS.items()))
    return _cached_pipeline(
        plan, rij_key, filter_type, filter_order, filter_ripple,
        float(alpha), bool(apply_filter), perf_key,
    )


def make_float(input) -> np.ndarray:
    """Element-by-element cast to a float ndarray (reference helpers.py:145-158)."""
    return np.array([float(v) for v in input])


def filter_data(
    st: ArrayStream,
    FILTER_TYPE: str,
    FMIN: float,
    FMAX: float,
    FILTER_ORDER: int,
    FILTER_RIPPLE: float,
) -> Tuple[ArrayStream, float, np.ndarray]:
    """Bandpass + 1% taper; returns (filtered stream, Fs, sos).

    Same contract as reference ``helpers.py:108-141`` including the
    butter-zerophase / cheby1-causal asymmetry.  Runs on device via the
    exact frequency-domain IIR (ops.filters.filter_bank_fft).
    """
    sos = _filters.design_sos(
        FILTER_TYPE, FMIN, FMAX, FILTER_ORDER, FILTER_RIPPLE, st.fs
    )
    L = _filters.impulse_length(sos, st.npts)
    h = _filters.impulse_response(sos, L)
    nfft = _filters.next_pow2(st.npts + L)
    taper = _filters.taper_window(st.npts)
    y = _filters.filter_bank_fft(
        jnp.asarray(st.data, jnp.float32),
        jnp.asarray(h[None, :], jnp.float32),
        jnp.asarray(taper, jnp.float32),
        nfft,
        zerophase=(FILTER_TYPE == "butter"),
    )
    stf = st.copy()
    stf.data = np.asarray(y[0], dtype=np.float64)
    return stf, st.fs, sos


def ltsva(
    st: ArrayStream,
    lat_list: Sequence[float],
    lon_list: Sequence[float],
    WINLEN: float,
    WINOVER: float,
    ALPHA: float = 1.0,
    plot_array_coordinates: bool = False,
    conf: float = None,
):
    """Least-squares / LTS array processing of a pre-filtered stream.

    8-tuple contract of the vendored solver as called at reference
    ``example.py:109`` and ``narrow_band_least_squares.py:91,183``:
    ``(vel, baz, t, mdccm, stdict, sig_tau, vel_uncert, baz_uncert)``.

    ``conf`` selects the uncertainty convention: ``None`` (default)
    returns the pipeline's 1-sigma linearized vel/baz uncertainties
    (PARITY.md); a confidence level (e.g. ``0.90``) returns the
    Szuberla & Olson 2004 slowness-plane chi-square-ellipse confidence
    intervals the vendored ``lts_array`` solver reports
    (ops.solve.chi2_ellipse_uncertainties).  With ``ALPHA < 1`` the
    ellipse for each window is built from the RETAINED co-array subset's
    normal matrix (ops.solve.subset_normal_inverses), matching the
    vendored solver's convention — flagged-out elements widen the CIs
    rather than being silently counted in the geometry.  The narrow-band
    wrappers discard both (reference
    ``narrow_band_least_squares.py:91-98``).
    """
    rij = get_rij(list(lat_list), list(lon_list), st.nchans)
    plan = make_plan([0.0, st.fs / 2], "linear", [WINLEN], WINOVER, st.npts, st.fs)
    pipe = _get_pipeline(plan, rij, alpha=ALPHA, apply_filter=False)
    res = pipe.run(st)
    n = res.num_compute_list[0]
    vel = res.vel_array[0, :n]
    baz = res.baz_array[0, :n]
    t = res.t_array[0, :n]
    mdccm = res.mdccm_array[0, :n]
    sig_tau = res.sig_tau_array[0, :n]
    vel_uncert = res.vel_uncert_array[0, :n]
    baz_uncert = res.baz_uncert_array[0, :n]
    if conf is not None:
        from narrow_band_least_squares_tpu.ops.solve import (
            chi2_ellipse_uncertainties,
            subset_normal_inverses,
        )
        xtx_inv = pipe.XtX_inv64
        if ALPHA < 1.0 and res.flags is not None:
            keep = ~np.asarray(res.flags)[0, :n, :]
            xtx_inv = subset_normal_inverses(pipe.X64, keep)
        vel_uncert, baz_uncert = chi2_ellipse_uncertainties(
            vel, baz, sig_tau, xtx_inv, conf=conf,
        )
    stdict = None
    if ALPHA < 1.0:
        stdict = flags_to_stdict(
            res.flags, res.t_array, res.num_compute_list, res.pairs,
            st.nchans, band_prefix=False,
        )
    if plot_array_coordinates:  # parity no-op convenience plot
        try:
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots()
            ax.scatter(rij[0], rij[1])
            ax.set_xlabel("X [km]")
            ax.set_ylabel("Y [km]")
            ax.axis("square")
            fig.savefig("array_coordinates.png", dpi=150)
            plt.close(fig)
        except Exception:  # pragma: no cover - plotting is best-effort here
            pass
    return vel, baz, t, mdccm, stdict, sig_tau, vel_uncert, baz_uncert


def narrow_band_least_squares(
    WINLEN_list: Sequence[float],
    WINOVER: float,
    ALPHA: float,
    st: ArrayStream,
    lat_list: Sequence[float],
    lon_list: Sequence[float],
    NBANDS: int,
    w: np.ndarray,
    h: np.ndarray,
    freqlist: Sequence[float],
    FREQ_BAND_TYPE: str,
    freq_resp_list: np.ndarray,
    FILTER_TYPE: str,
    FILTER_ORDER: int,
    FILTER_RIPPLE: float,
):
    """Narrow-band least-squares processing (reference tuple contract).

    Returns ``(vel_array, baz_array, mdccm_array, t_array, stdict_all,
    sig_tau_array, num_compute_list, w_array, h_array)`` as at reference
    ``narrow_band_least_squares.py:127``.  ``w``/``h`` are accepted for
    signature parity (the reference passes the broadband response only to
    size its per-band response arrays).
    """
    rij = get_rij(list(lat_list), list(lon_list), st.nchans)
    plan = make_plan(freqlist, FREQ_BAND_TYPE, WINLEN_list, WINOVER, st.npts, st.fs)
    if plan.nbands != NBANDS:
        raise ValueError(
            f"freqlist implies {plan.nbands} bands but NBANDS={NBANDS}"
        )
    pipe = _get_pipeline(
        plan, rij, filter_type=FILTER_TYPE, filter_order=FILTER_ORDER,
        filter_ripple=FILTER_RIPPLE, alpha=ALPHA,
    )
    res = pipe.run(st, freq_resp_list=np.asarray(freq_resp_list))
    stdict_all = res.stdict(band_prefix=True) if ALPHA < 1.0 else None
    return (
        res.vel_array, res.baz_array, res.mdccm_array, res.t_array,
        stdict_all, res.sig_tau_array, res.num_compute_list,
        res.w_array, res.h_array,
    )


def narrow_band_loop(
    ii: int,
    freqlist: Sequence[float],
    FREQ_BAND_TYPE: str,
    freq_resp_list: np.ndarray,
    st: ArrayStream,
    FILTER_TYPE: str,
    FILTER_ORDER: int,
    FILTER_RIPPLE: float,
    lat_list: Sequence[float],
    lon_list: Sequence[float],
    WINLEN_list: Sequence[float],
    WINOVER: float,
    ALPHA: float,
    vector_len: int,
):
    """One band's work, the reference's parallel-worker contract.

    Mirrors reference ``narrow_band_least_squares.py:134-218``: returns the
    10-tuple ``(vel, baz, mdccm, t, stdict_times, stdict_elements, sig_tau,
    num_compute, w, h)`` with every vector padded to ``vector_len`` and the
    band's stdict flattened into two parallel object arrays (the pickle
    boundary workaround the reference needed for joblib).  Kept for drop-in
    compatibility; new code should call `narrow_band_least_squares` once for
    all bands.
    """
    from scipy import signal as _signal

    from narrow_band_least_squares_tpu.utils.plan import band_edges

    tempfmin, tempfmax = band_edges(freqlist, ii, FREQ_BAND_TYPE)
    stf, Fs, sos = filter_data(
        st, FILTER_TYPE, tempfmin, tempfmax, FILTER_ORDER, FILTER_RIPPLE
    )
    w_temp, h_temp = _signal.sosfreqz(sos, freq_resp_list, fs=Fs)

    temp_BT = WINLEN_list[ii] * (tempfmax - tempfmin)
    if temp_BT < 5.0:
        print(
            "CAUTION: BT < 5! Band between " + str(tempfmin) + " Hz and "
            + str(tempfmax) + " Hz has BT = " + str(temp_BT)
        )

    vel, baz, t, mdccm, stdict, sig_tau, _, _ = ltsva(
        stf, lat_list, lon_list, WINLEN_list[ii], WINOVER, ALPHA
    )
    num_compute = np.array(len(vel))
    pad = (0, vector_len - int(num_compute))
    vel_f = np.pad(make_float(vel), pad)
    baz_f = np.pad(make_float(baz), pad)
    mdccm_f = np.pad(make_float(mdccm), pad)
    t_f = np.pad(make_float(t), pad)
    sig_f = np.pad(make_float(sig_tau), pad)

    if ALPHA == 1.0:
        stdict_times = None
        stdict_elements = None
    else:
        items = list(stdict.items())
        arr = np.array(items, dtype=object)
        stdict_times = arr[:, 0]
        stdict_elements = arr[:, 1]

    return (
        vel_f, baz_f, mdccm_f, t_f, stdict_times, stdict_elements,
        sig_f, num_compute, w_temp, h_temp,
    )


def narrow_band_least_squares_parallel(*args, **kwargs):
    """Parity alias for the reference's joblib path.

    On TPU the bands already execute as one batched device computation
    (the joblib fan-out at reference ``narrow_band_least_squares.py:285``
    existed to work around Python's per-band loop), so both entry points run
    the same compiled step; multi-chip scaling is handled by
    `parallel.sharded_pipeline` instead.
    """
    return narrow_band_least_squares(*args, **kwargs)
