"""Plan-layer tests: frequency bands, window lengths, window grids.

Expected values mirror the reference semantics (helpers.py:8-104,
narrow_band_least_squares.py:41-47) including the canonical example.py
workload numbers documented in BASELINE.md.
"""

import numpy as np
import pytest

from narrow_band_least_squares_tpu.utils.plan import (
    WindowPlan,
    band_edges,
    get_freqlist,
    get_winlenlist,
    make_plan,
    reference_vector_len,
)


class TestGetFreqlist:
    def test_log_canonical(self):
        # The example.py band set (BASELINE.md: 8 log bands 0.1..5 Hz)
        freqlist, nbands, fmax = get_freqlist(0.1, 5.0, "log", 8)
        expected = [0.100, 0.163, 0.266, 0.434, 0.707, 1.153, 1.880, 3.066, 5.000]
        np.testing.assert_allclose(freqlist, expected, atol=5e-4)
        assert nbands == 8
        assert fmax == 5.0

    def test_linear(self):
        freqlist, nbands, fmax = get_freqlist(1.0, 5.0, "linear", 4)
        np.testing.assert_allclose(freqlist[:5], [1, 2, 3, 4, 5])
        assert nbands == 4 and fmax == 5.0

    def test_octave_recomputes_nbands_and_fmax(self):
        freqlist, nbands, fmax = get_freqlist(0.1, 5.0, "octave", 99)
        # 0.1, 0.2, 0.4, 0.8, 1.6, 3.2 (6.4 > 5 stops)
        np.testing.assert_allclose(freqlist, [0.1, 0.2, 0.4, 0.8, 1.6, 3.2])
        assert nbands == 5
        assert fmax == pytest.approx(3.2)

    def test_2_octave_over(self):
        freqlist, nbands, fmax = get_freqlist(0.1, 5.0, "2_octave_over", 99)
        np.testing.assert_allclose(freqlist, [0.1, 0.2, 0.4, 0.8, 1.6, 3.2])
        assert nbands == 4  # len - 2
        lo, hi = band_edges(freqlist, 0, "2_octave_over")
        assert (lo, hi) == (0.1, 0.4)  # f2 = 4*f1: two-octave band

    def test_onethird_octave(self):
        freqlist, nbands, fmax = get_freqlist(1.0, 2.0, "onethird_octave", 99)
        c = 2 ** (1.0 / 3.0)
        np.testing.assert_allclose(freqlist, [1.0, c, c * c, 2.0], rtol=1e-9)
        assert nbands == 3

    def test_octave_linear(self):
        freqlist, nbands, fmax = get_freqlist(0.5, 5.0, "octave_linear", 6)
        # octave part: 0.5, 1.0, 2.0 then linear from 2.0 to 5.0 in 3 bands
        np.testing.assert_allclose(freqlist[:3], [0.5, 1.0, 2.0])
        assert fmax == 5.0
        assert freqlist[-1] >= 5.0 - 1e-9


class TestGetWinlenlist:
    def test_constant(self):
        assert get_winlenlist("constant", 4, 50, 60, 30) == [50, 50, 50, 50]

    def test_adaptive_canonical(self):
        # example.py: adaptive 60 -> 30 over 8 bands (BASELINE.md)
        got = get_winlenlist("adaptive", 8, 50, 60, 30)
        assert got == [60, 55, 51, 47, 42, 38, 34, 30]


class TestWindowPlan:
    def test_canonical_counts_and_vector_len(self):
        # canonical workload: Fs=20, 1200 s, WINOVER=0.5
        fs, npts = 20.0, 24000
        winlens = [60, 55, 51, 47, 42, 38, 34, 30]
        assert reference_vector_len(winlens, 0.5, npts, fs) == 79
        plans = [WindowPlan.build(w, 0.5, npts, fs) for w in winlens]
        # coarsest band: 39 windows; finest: 79 windows; all fit in width
        assert plans[0].n_windows == 39
        assert plans[-1].n_windows == 79
        for p in plans:
            assert p.n_windows <= 79
            assert p.starts[-1] + p.winlensamp <= npts

    def test_make_plan(self):
        freqlist, nbands, _ = get_freqlist(0.1, 5.0, "log", 8)
        winlens = get_winlenlist("adaptive", nbands, 50, 60, 30)
        plan = make_plan(freqlist, "log", winlens, 0.5, 24000, 20.0)
        assert plan.nbands == 8
        assert plan.vector_len == 79
        assert plan.width == 79
        assert plan.num_compute_list == [39, 42, 46, 50, 56, 62, 69, 79]
        assert plan.max_winlensamp == 1200
        bt = plan.bt_products()
        assert len(bt) == 8
        assert bt[0] < 5.0  # lowest band of example.py warns BT<5

    def test_window_times_are_window_end(self):
        p = WindowPlan.build(10, 0.5, 200, 10.0)
        t = p.end_times_epoch(1000.0, 10.0)
        assert t[0] == pytest.approx(1000.0 + 10.0)
        assert t[1] - t[0] == pytest.approx(5.0)

    def test_too_short_signal_raises(self):
        with pytest.raises(ValueError):
            WindowPlan.build(60, 0.5, 100, 10.0)
