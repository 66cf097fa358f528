"""Smoke tests for all eight parity figures (render + save, no crash)."""

import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from narrow_band_least_squares_tpu import api
from narrow_band_least_squares_tpu import plotting as plot
from narrow_band_least_squares_tpu.utils.plan import get_freqlist, get_winlenlist


@pytest.fixture(scope="module")
def ols_results(small_stream):
    st = small_stream
    freqlist, nbands, fmax = get_freqlist(0.2, 1.6, "log", 3)
    winlens = get_winlenlist("adaptive", nbands, 30, 40, 20)
    fr = np.logspace(-2, np.log10(st.fs / 2), 60)
    out = api.narrow_band_least_squares(
        winlens, 0.5, 1.0, st, st.latitudes, st.longitudes,
        nbands, None, None, freqlist, "log", fr, "cheby1", 2, 0.01,
    )
    stf, _, sos = api.filter_data(st, "cheby1", 0.2, 1.6, 2, 0.01)
    return st, stf, freqlist, nbands, winlens, out


@pytest.fixture(scope="module")
def lts_results(outlier_stream):
    st = outlier_stream
    freqlist, nbands, fmax = get_freqlist(0.2, 1.6, "log", 3)
    winlens = get_winlenlist("constant", nbands, 30, 0, 0)
    fr = np.logspace(-2, np.log10(st.fs / 2), 60)
    out = api.narrow_band_least_squares(
        winlens, 0.5, 0.75, st, st.latitudes, st.longitudes,
        nbands, None, None, freqlist, "log", fr, "cheby1", 2, 0.01,
    )
    stf, _, _ = api.filter_data(st, "cheby1", 0.2, 1.6, 2, 0.01)
    return st, stf, freqlist, nbands, winlens, out


def _save(fig, tmp_path, name):
    p = os.path.join(tmp_path, name + ".png")
    fig.savefig(p, dpi=60)
    assert os.path.getsize(p) > 1000
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_broadband_figures(ols_results, small_stream, tmp_path):
    st, stf, freqlist, nbands, winlens, out = ols_results
    vel, baz, t, mdccm, stdict, sig, vu, bu = api.ltsva(
        stf, st.latitudes, st.longitudes, 30, 0.5, 1.0
    )
    fig = plot.broadband_plot(stf, vel, baz, mdccm, t, 0.6, 1.0, stdict, sig)
    _save(fig, tmp_path, "broadband")

    from scipy import signal
    from narrow_band_least_squares_tpu.ops.filters import design_sos

    sos = design_sos("cheby1", 0.2, 1.6, 2, 0.01, st.fs)
    fr = np.logspace(-2, np.log10(st.fs / 2), 100)
    w, h = signal.sosfreqz(sos, fr, fs=st.fs)
    fig = plot.broadband_filter_response_plot(w, h, 0.2, 1.6, "cheby1", 2, 0.01)
    _save(fig, tmp_path, "filter_response")


def test_narrow_band_figures_ols(ols_results, tmp_path):
    st, stf, freqlist, nbands, winlens, out = ols_results
    (vel_a, baz_a, mdccm_a, t_a, stdict_all, sig_a, num, w_a, h_a) = out
    fig = plot.narrow_band_plot(
        0.2, 1.6, stf, nbands, freqlist, "log",
        vel_a, baz_a, mdccm_a, t_a, num, 0.6,
    )
    _save(fig, tmp_path, "narrow_band")
    fig = plot.narrow_band_stau_plot(
        0.2, 1.6, stf, nbands, freqlist, "log",
        vel_a, baz_a, mdccm_a, t_a, sig_a, num, 0.6, 1.0,
    )
    _save(fig, tmp_path, "narrow_band_stau")
    rij = api.get_rij(st.latitudes, st.longitudes, st.nchans)
    fig = plot.narrow_band_processing_parameters_plot(
        rij, "log", freqlist, winlens, nbands, 0.2, 1.6,
        w_a, h_a, "cheby1", 2, 0.01,
    )
    _save(fig, tmp_path, "params")
    fig = plot.baz_freq_plot(
        0.2, 1.6, nbands, freqlist, vel_a, baz_a, mdccm_a, t_a, num, 0.6
    )
    _save(fig, tmp_path, "baz_freq")


def test_narrow_band_figures_lts(lts_results, tmp_path):
    st, stf, freqlist, nbands, winlens, out = lts_results
    (vel_a, baz_a, mdccm_a, t_a, stdict_all, sig_a, num, w_a, h_a) = out
    assert stdict_all is not None and stdict_all["size"] == st.nchans
    fig = plot.narrow_band_lts_plot(
        0.2, 1.6, stf, nbands, freqlist, "log",
        vel_a, baz_a, mdccm_a, t_a, stdict_all, num, 0.5, 0.75,
    )
    _save(fig, tmp_path, "narrow_band_lts")
    fig = plot.narrow_band_lts_dropped_station_plot(
        0.2, 1.6, stf, nbands, freqlist, "log",
        vel_a, baz_a, mdccm_a, t_a, stdict_all, num, 0.5,
    )
    _save(fig, tmp_path, "narrow_band_lts_dropped")
