"""Oracle self-consistency: the CPU reference must recover known physics.

The reference repo has no tests (SURVEY §4); physical plausibility of the
outputs (trace velocity in ~0.25-0.45 km/s, correct back-azimuth) is the
implicit validation its plots hardcode (reference plotting.py:115,1237).
Here the oracle must recover the *known* parameters of a synthetic plane
wave, which is a strictly stronger check.
"""

import numpy as np
import pytest

from narrow_band_least_squares_tpu.oracle.ltsva import (
    filter_and_taper,
    ltsva_oracle,
    sliding_window_solve,
)
from narrow_band_least_squares_tpu.oracle.pipeline import (
    narrow_band_least_squares_oracle,
)
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import get_freqlist, get_winlenlist


def test_ltsva_recovers_plane_wave(small_stream):
    st = small_stream
    filt, _ = filter_and_taper(st.data, st.fs, "cheby1", 0.2, 1.2, 2, 0.01)
    st2 = st.copy()
    st2.data = filt
    vel, baz, t, mdccm, stdict, sig_tau, vu, bu = ltsva_oracle(
        st2, st.latitudes, st.longitudes, 30.0, 0.5, 1.0
    )
    assert stdict is None  # OLS mode (reference contract)
    good = mdccm > 0.6
    assert good.sum() >= len(mdccm) * 0.6
    # median over confident windows recovers the synthetic ground truth
    assert np.median(baz[good]) == pytest.approx(230.0, abs=7.0)
    assert np.median(vel[good]) == pytest.approx(0.34, rel=0.12)
    assert np.all(mdccm <= 1.0 + 1e-9)
    assert np.all(sig_tau[good] < 1.0)
    assert t.shape == vel.shape == baz.shape == mdccm.shape


def test_lts_flags_outlier_element(outlier_stream):
    st = outlier_stream
    filt, _ = filter_and_taper(st.data, st.fs, "cheby1", 0.2, 1.2, 2, 0.01)
    res = sliding_window_solve(
        filt, get_rij(st.latitudes, st.longitudes, st.nchans),
        st.fs, st.start_epoch, 30.0, 0.5, 0.75,
    )
    # element 2 (0-based) is incoherent: its pairs should dominate the flags
    flags = res["flags"]  # (W, P)
    pairs = res["pairs"]
    touches_outlier = np.array([(2 in p) for p in pairs])
    frac_outlier = flags[:, touches_outlier].mean()
    frac_other = flags[:, ~touches_outlier].mean()
    assert frac_outlier > 2.0 * frac_other
    # LTS should still recover the true direction
    good = res["mdccm"] > 0.5
    assert np.median(res["baz"][good]) == pytest.approx(120.0, abs=8.0)

    # stdict contract: 'size' key + 7-decimal timestamp keys, 1-based elements
    stdict = res["stdict"]
    assert stdict["size"] == st.nchans
    keys = [k for k in stdict if k != "size"]
    assert len(keys) == flags.shape[0]
    for k in keys[:5]:
        assert len(k.split(".")[-1]) == 7
        vals = stdict[k]
        if len(vals):
            assert vals.min() >= 1 and vals.max() <= st.nchans


def test_narrow_band_oracle_shapes(small_stream):
    st = small_stream
    freqlist, nbands, fmax = get_freqlist(0.2, 1.6, "log", 3)
    winlens = get_winlenlist("adaptive", nbands, 30, 40, 20)
    freq_resp_list = np.logspace(-2, np.log10(st.fs / 2), 50)
    out = narrow_band_least_squares_oracle(
        winlens, 0.5, 1.0, st, st.latitudes, st.longitudes,
        nbands, freqlist, "log", freq_resp_list, "cheby1", 2, 0.01,
    )
    (vel_a, baz_a, mdccm_a, t_a, stdict_all, sig_a, num_compute, w_a, h_a) = out
    assert vel_a.shape == baz_a.shape == mdccm_a.shape == t_a.shape
    assert vel_a.shape[0] == nbands
    assert stdict_all is None
    assert len(num_compute) == nbands
    assert all(n <= vel_a.shape[1] for n in num_compute)
    assert w_a.shape == (nbands, 50)
    # valid prefixes are filled; median direction still right in mid band
    n1 = num_compute[1]
    good = mdccm_a[1, :n1] > 0.6
    if good.sum() > 5:
        assert np.median(baz_a[1, :n1][good]) == pytest.approx(230.0, abs=10.0)


def test_butter_zerophase_differs_from_causal(small_stream):
    st = small_stream
    causal, _ = filter_and_taper(st.data, st.fs, "cheby1", 0.2, 1.2, 2, 0.01)
    zero, _ = filter_and_taper(st.data, st.fs, "butter", 0.2, 1.2, 2, 0.01)
    # both bandpass, but phase behavior differs (reference asymmetry,
    # helpers.py:127 vs :135) — outputs must not be identical
    assert not np.allclose(causal, zero)
