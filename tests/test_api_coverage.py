"""Coverage of remaining reference behaviors: band families end-to-end,
zero-phase butter pipeline, config round-trip, determinism."""

import numpy as np
import pytest

from narrow_band_least_squares_tpu import NBLSConfig, api
from narrow_band_least_squares_tpu.oracle.pipeline import (
    narrow_band_least_squares_oracle,
)
from narrow_band_least_squares_tpu.utils.plan import get_freqlist, get_winlenlist


def _run_api(st, freqlist, nbands, winlens, band_type, filter_type="cheby1",
             alpha=1.0):
    fr = np.logspace(-2, np.log10(st.fs / 2), 40)
    return api.narrow_band_least_squares(
        winlens, 0.5, alpha, st, st.latitudes, st.longitudes,
        nbands, None, None, freqlist, band_type, fr, filter_type, 2, 0.01,
    )


class TestBandFamilies:
    def test_2_octave_over_end_to_end(self, small_stream):
        st = small_stream
        freqlist, nbands, fmax = get_freqlist(0.2, 1.6, "2_octave_over", 99)
        winlens = get_winlenlist("constant", nbands, 30, 0, 0)
        out = _run_api(st, freqlist, nbands, winlens, "2_octave_over")
        vel_a, baz_a, mdccm_a = out[0], out[1], out[2]
        num = out[6]
        assert vel_a.shape[0] == nbands
        # overlapping two-octave bands still recover the wave
        for b in range(nbands):
            good = mdccm_a[b, : num[b]] > 0.6
            if good.sum() > 5:
                d = np.abs(
                    (baz_a[b, : num[b]][good] - 230.0 + 180.0) % 360.0 - 180.0
                )
                assert np.median(d) < 10.0

    def test_octave_end_to_end(self, small_stream):
        st = small_stream
        freqlist, nbands, fmax = get_freqlist(0.2, 1.6, "octave", 99)
        winlens = get_winlenlist("constant", nbands, 30, 0, 0)
        out = _run_api(st, freqlist, nbands, winlens, "octave")
        assert out[0].shape[0] == nbands == 3

    def test_onethird_octave_end_to_end(self, small_stream):
        st = small_stream
        freqlist, nbands, fmax = get_freqlist(0.4, 1.2, "onethird_octave", 99)
        winlens = get_winlenlist("constant", nbands, 30, 0, 0)
        out = _run_api(st, freqlist, nbands, winlens, "onethird_octave")
        assert out[0].shape[0] == nbands


class TestButterPipeline:
    def test_butter_zerophase_vs_oracle(self, small_stream):
        st = small_stream
        freqlist, nbands, _ = get_freqlist(0.3, 1.2, "log", 2)
        winlens = get_winlenlist("constant", nbands, 30, 0, 0)
        fr = np.logspace(-2, np.log10(st.fs / 2), 40)
        o = narrow_band_least_squares_oracle(
            winlens, 0.5, 1.0, st, st.latitudes, st.longitudes,
            nbands, freqlist, "log", fr, "butter", 2, 0.01,
        )
        g = _run_api(st, freqlist, nbands, winlens, "log", filter_type="butter")
        num = g[6]
        for b in range(nbands):
            n = num[b]
            good = o[2][b, :n] > 0.6
            d = np.abs((g[1][b, :n] - o[1][b, :n] + 180.0) % 360.0 - 180.0)
            # zerophase |H|^2 vs finite two-pass differ at edges; interior
            # windows agree closely
            assert np.median(d[good]) < 2.0


class TestDeterminism:
    def test_same_input_same_output(self, small_stream):
        st = small_stream
        freqlist, nbands, _ = get_freqlist(0.3, 1.2, "log", 2)
        winlens = get_winlenlist("constant", nbands, 30, 0, 0)
        a = _run_api(st, freqlist, nbands, winlens, "log")
        b = _run_api(st, freqlist, nbands, winlens, "log")
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[2], b[2])


class TestConfig:
    def test_json_roundtrip(self, tmp_path):
        cfg = NBLSConfig(ALPHA=0.8, NBANDS=12, FREQ_BAND_TYPE="octave_linear")
        p = str(tmp_path / "cfg.json")
        cfg.to_json(p)
        back = NBLSConfig.from_json(p)
        assert back == cfg

    def test_replace(self):
        cfg = NBLSConfig()
        c2 = cfg.replace(ALPHA=0.6)
        assert c2.ALPHA == 0.6 and cfg.ALPHA == 1.0
