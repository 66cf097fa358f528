"""The MXU (DFT-as-matmul) cross-correlation must match the FFT path and
the plain NumPy definition."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from narrow_band_least_squares_tpu.ops import xcorr as XC
from narrow_band_least_squares_tpu.ops.filters import next_pow2
from narrow_band_least_squares_tpu.utils.geometry import pair_indices


@pytest.fixture(scope="module")
def window_batch():
    rng = np.random.default_rng(3)
    B, W, C, L = 2, 5, 4, 200
    win = rng.standard_normal((B, W, C, L))
    # inject known integer delays between channels in cell (0, 0)
    base = rng.standard_normal(L + 40)
    for c, d in enumerate([0, 3, -5, 10]):
        win[0, 0, c] = base[20 - d : 20 - d + L]
    win -= win.mean(axis=-1, keepdims=True)
    pairs = pair_indices(C)
    lags = np.arange(-(L - 1), L)
    lag_mask = np.ones((B, 2 * L - 1), dtype=bool)
    return jnp.asarray(win, jnp.float32), jnp.asarray(pairs), jnp.asarray(lag_mask), L


def test_mxu_matches_fft(window_batch):
    win, pairs, lag_mask, L = window_batch
    fs = 10.0
    tau_f, rho_f, md_f = XC.cross_correlate(
        win, pairs, lag_mask, next_pow2(2 * L), fs
    )
    tables = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in XC.precompute_dft_tables(L, np.float64).items()}
    tau_m, rho_m, md_m = XC.cross_correlate_mxu(win, pairs, lag_mask, tables, fs)
    np.testing.assert_array_equal(np.asarray(tau_f), np.asarray(tau_m))
    np.testing.assert_allclose(np.asarray(rho_f), np.asarray(rho_m), atol=2e-5)
    np.testing.assert_allclose(np.asarray(md_f), np.asarray(md_m), atol=2e-5)


def test_lag_tiled_matches_full(window_batch):
    """Lag-axis tiling (running max/argmax across inverse-DFT column tiles)
    must select the same peak (tau identical) as the full-materialization
    program, including per-band lag masks.  cc *values* are the same
    contraction over K at the same precision — bit-identical on the MXU's
    fixed systolic accumulation (verified on v5e), but the CPU backend's
    SIMD packing differs with the output-tile shape, so rho is compared at
    float tolerance here."""
    win, pairs, lag_mask, L = window_batch
    fs = 10.0
    # heterogeneous per-band masks: band 1 only searches |lag| <= 60
    lm = np.asarray(lag_mask).copy()
    lags = np.arange(-(L - 1), L)
    lm[1] = np.abs(lags) <= 60
    lm = jnp.asarray(lm)
    tables = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in XC.precompute_dft_tables(L, np.float64).items()}
    ref = XC.cross_correlate_mxu(win, pairs, lm, tables, fs, lag_tile=0)
    for tile in (64, 100, 128, 512):
        out = XC.cross_correlate_mxu(
            win, pairs, lm, tables, fs, lag_tile=tile
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))
        np.testing.assert_allclose(
            np.asarray(ref[1]), np.asarray(out[1]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ref[2]), np.asarray(out[2]), atol=1e-6
        )
    # band 1's selected lags respect the tighter mask under tiling
    out = XC.cross_correlate_mxu(win, pairs, lm, tables, fs, lag_tile=64)
    assert np.all(np.abs(np.asarray(out[0])[1] * fs) <= 60)


def test_lag_tiled_tie_break_first_max():
    """Exact ties spanning tile boundaries resolve to the smallest masked
    lag (the reference's ascending-lag np.argmax convention).  An all-zero
    channel pair gives cc == 0 exactly at every lag — the maximal tie."""
    L = 96
    win = np.zeros((2, 1, 2, L))
    # band 1: normal random data (sanity that ties don't leak across bands)
    rng = np.random.default_rng(11)
    win[1] = rng.standard_normal((1, 2, L))
    win -= win.mean(axis=-1, keepdims=True)
    pairs = jnp.asarray(np.array([[0, 1]], dtype=np.int32))
    lags = np.arange(-(L - 1), L)
    lag_mask = np.ones((2, 2 * L - 1), dtype=bool)
    lag_mask[0] = np.abs(lags) <= 40          # first masked lag = -40
    tables = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in XC.precompute_dft_tables(L, np.float64).items()}
    winj = jnp.asarray(win, jnp.float32)
    lm = jnp.asarray(lag_mask)
    ref = XC.cross_correlate_mxu(winj, pairs, lm, tables, 1.0, lag_tile=0)
    assert np.asarray(ref[0])[0, 0, 0] == -40.0
    for tile in (16, 32, 48, 64):
        out = XC.cross_correlate_mxu(winj, pairs, lm, tables, 1.0,
                                     lag_tile=tile)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))


def test_known_delays_recovered(window_batch):
    win, pairs, lag_mask, L = window_batch
    fs = 10.0
    tables = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in XC.precompute_dft_tables(L, np.float64).items()}
    tau, rho, md = XC.cross_correlate_mxu(win, pairs, lag_mask, tables, fs)
    # channel delays [0, 3, -5, 10]: tau_p = delay_j - delay_i (in samples/fs)
    delays = [0, 3, -5, 10]
    expect = [delays[j] - delays[i] for i, j in np.asarray(pairs)]
    np.testing.assert_allclose(
        np.asarray(tau)[0, 0] * fs, expect, atol=0
    )
    assert np.all(np.asarray(rho)[0, 0] > 0.9)


def test_matches_numpy_correlate(window_batch):
    win, pairs, lag_mask, L = window_batch
    fs = 10.0
    tables = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in XC.precompute_dft_tables(L, np.float64).items()}
    tau, rho, md = XC.cross_correlate_mxu(win, pairs, lag_mask, tables, fs)
    w = np.asarray(win)
    for p, (i, j) in enumerate(np.asarray(pairs)):
        cc = np.correlate(w[1, 2, j], w[1, 2, i], mode="full")
        k = int(np.argmax(cc))
        assert np.asarray(tau)[1, 2, p] * fs == pytest.approx(k - (L - 1))


def test_lag_cap_matches_full_when_delays_small(window_batch):
    """max_lag production mode: identical results when true delays fit."""
    win, pairs, lag_mask, L = window_batch
    fs = 10.0
    full = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
            for k, v in XC.precompute_dft_tables(L, np.float64).items()}
    tau_f, rho_f, _ = XC.cross_correlate_mxu(win, pairs, lag_mask, full, fs)

    capped_np = XC.precompute_dft_tables(L, np.float64, max_lag=40)
    capped = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in capped_np.items()}
    c = L - 1
    lm = jnp.asarray(np.asarray(lag_mask)[:, c - 40 : c + 41])
    tau_c, rho_c, _ = XC.cross_correlate_mxu(win, pairs, lm, capped, fs)
    # cell (0,0) has injected delays <= 10 samples << 40-sample cap
    np.testing.assert_array_equal(
        np.asarray(tau_f)[0, 0], np.asarray(tau_c)[0, 0]
    )
    np.testing.assert_allclose(
        np.asarray(rho_f)[0, 0], np.asarray(rho_c)[0, 0], atol=1e-6
    )


def test_pipeline_max_lag_s(small_stream):
    from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    st = small_stream
    freqlist, nbands, _ = get_freqlist(0.3, 1.2, "log", 2)
    winlens = get_winlenlist("constant", nbands, 30, 0, 0)
    plan = make_plan(freqlist, "log", winlens, 0.5, st.npts, st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    full = NarrowBandPipeline(plan, rij, alpha=1.0)
    capped = NarrowBandPipeline(plan, rij, alpha=1.0, max_lag_s=15.0)
    r1 = full.run_raw(st.data)
    r2 = capped.run_raw(st.data)
    # aperture ~2 km, vel >= 0.2 km/s -> |tau| <= ~10 s < 15 s cap:
    # confident windows agree
    good = np.asarray(r1["mdccm"]) > 0.6
    np.testing.assert_allclose(
        np.asarray(r1["vel"])[good], np.asarray(r2["vel"])[good],
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("method", ["patches", "strided"])
def test_window_methods_match_gather(small_stream, method):
    from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    st = small_stream
    freqlist, nbands, _ = get_freqlist(0.3, 1.2, "log", 2)
    winlens = get_winlenlist("adaptive", nbands, 30, 35, 25)
    plan = make_plan(freqlist, "log", winlens, 0.5, st.npts, st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    ref = NarrowBandPipeline(plan, rij, alpha=1.0, window_method="gather")
    got = NarrowBandPipeline(plan, rij, alpha=1.0, window_method=method)
    r1 = ref.run_raw(st.data)
    r2 = got.run_raw(st.data)
    np.testing.assert_allclose(np.asarray(r1["vel"]), np.asarray(r2["vel"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1["mdccm"]),
                               np.asarray(r2["mdccm"]), rtol=1e-5, atol=1e-5)


def test_subsample_interpolation_recovers_fractional_delay():
    """Parabolic refinement beats integer lags on a fractional-delay wave."""
    rng = np.random.default_rng(11)
    fs = 10.0
    L = 400
    n = 4096
    src = rng.standard_normal(n)
    # band-limit so the correlation peak is smooth
    S = np.fft.rfft(src)
    f = np.fft.rfftfreq(n, 1 / fs)
    S[(f < 0.3) | (f > 1.5)] = 0
    src = np.fft.irfft(S, n)
    true_delay = 0.33  # seconds, NOT an integer number of samples (3.3)
    shifted = np.fft.irfft(
        np.fft.rfft(src) * np.exp(-2j * np.pi * np.fft.rfftfreq(n, 1 / fs)
                                  * true_delay), n
    )
    a = src[1000:1000 + L]
    b = shifted[1000:1000 + L]
    win = np.zeros((1, 1, 2, L))
    win[0, 0, 0] = a - a.mean()
    win[0, 0, 1] = b - b.mean()
    pairs = jnp.asarray([[0, 1]], dtype=jnp.int32)
    lag_mask = jnp.ones((1, 2 * L - 1), dtype=bool)
    tables = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in XC.precompute_dft_tables(L, np.float64).items()}
    wj = jnp.asarray(win, jnp.float32)
    tau_int, _, _ = XC.cross_correlate_mxu(wj, pairs, lag_mask, tables, fs)
    tau_sub, _, _ = XC.cross_correlate_mxu(
        wj, pairs, lag_mask, tables, fs, subsample=True
    )
    err_int = abs(float(tau_int[0, 0, 0]) - true_delay)
    err_sub = abs(float(tau_sub[0, 0, 0]) - true_delay)
    assert err_int <= 0.5 / fs + 1e-6
    assert err_sub < err_int
    assert err_sub < 0.02  # sub-sample accuracy


@pytest.mark.parametrize("lag_tile", [32, 100, 256, 512])
def test_subsample_lag_tiled_bit_identical(lag_tile):
    """VERDICT r4 item 4: subsample=True composes with lag tiling — the
    running (max, argmax) carries the two neighbor cc columns (tile-edge
    neighbors via a carried boundary column / next-tile patch), so the
    full (B, W, P, nlag) cc tensor never materializes and the refined
    tau matches the untiled subsample path at every tile size.  Like
    test_lag_tiled_matches_full, cc values are bit-identical on the MXU's
    shape-invariant accumulation (verified on v5e, BENCH_LAGTILE.json)
    but the CPU backend's SIMD packing varies with the output-tile width,
    so cc-derived quantities (rho and the parabolic frac) are compared at
    float tolerance here while the integer peak index is exact."""
    rng = np.random.default_rng(7)
    B, W, C, L = 3, 4, 5, 130
    fs = 20.0
    win = rng.standard_normal((B, W, C, L))
    win -= win.mean(axis=-1, keepdims=True)
    pairs_np = np.array(
        [[i, j] for i in range(C) for j in range(i + 1, C)], np.int32
    )
    pairs = jnp.asarray(pairs_np)
    nlag = 2 * L - 1
    # non-trivial per-band lag masks (different effective lengths)
    lag_mask = np.zeros((B, nlag), bool)
    for b, half in enumerate([L - 1, 90, 40]):
        c = L - 1
        lag_mask[b, c - half : c + half + 1] = True
    lag_mask = jnp.asarray(lag_mask)
    tables = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in XC.precompute_dft_tables(L, np.float32).items()}
    wj = jnp.asarray(win, jnp.float32)
    tau_ref, rho_ref, md_ref = XC.cross_correlate_mxu(
        wj, pairs, lag_mask, tables, fs, subsample=True, lag_tile=0
    )
    tau_t, rho_t, md_t = XC.cross_correlate_mxu(
        wj, pairs, lag_mask, tables, fs, subsample=True, lag_tile=lag_tile
    )
    # same integer peak selected everywhere...
    tau_r, tau_g = np.asarray(tau_ref), np.asarray(tau_t)
    np.testing.assert_array_equal(np.round(tau_r * fs), np.round(tau_g * fs))
    # ...and the parabolic frac agrees to float tolerance (|frac| <= 0.5)
    np.testing.assert_allclose(tau_g, tau_r, atol=2e-4 / fs)
    np.testing.assert_allclose(np.asarray(rho_t), np.asarray(rho_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(md_t), np.asarray(md_ref),
                               atol=2e-5)


def test_subsample_lag_tiled_integer_parity():
    """Tiled subsample on an integer-delay impulse still lands the same
    integer lag as the non-subsample tiled path (frac ~ 0 corrections)."""
    rng = np.random.default_rng(3)
    L = 200
    fs = 10.0
    win = rng.standard_normal((1, 2, 3, L)).astype(np.float32)
    win -= win.mean(axis=-1, keepdims=True)
    pairs = jnp.asarray([[0, 1], [0, 2], [1, 2]], jnp.int32)
    lag_mask = jnp.ones((1, 2 * L - 1), bool)
    tables = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in XC.precompute_dft_tables(L, np.float32).items()}
    wj = jnp.asarray(win)
    tau_int, _, _ = XC.cross_correlate_mxu(
        wj, pairs, lag_mask, tables, fs, subsample=False, lag_tile=64
    )
    tau_sub, _, _ = XC.cross_correlate_mxu(
        wj, pairs, lag_mask, tables, fs, subsample=True, lag_tile=64
    )
    # the parabolic correction is bounded by half a sample
    assert np.all(np.abs(np.asarray(tau_sub) - np.asarray(tau_int))
                  <= 0.5 / fs + 1e-7)


def test_bucketed_bands_match_plain(small_stream):
    """bucket_bands=True (compact per-winlen-bucket grids) is numerically
    equivalent to the single global grid, for OLS and LTS."""
    from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    st = small_stream
    freqlist, nbands, _ = get_freqlist(0.3, 1.2, "log", 4)
    winlens = get_winlenlist("adaptive", nbands, 30, 40, 20)
    plan = make_plan(freqlist, "log", winlens, 0.5, st.npts, st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    for alpha in (1.0, 0.75):
        ref = NarrowBandPipeline(plan, rij, alpha=alpha, bucket_bands=False)
        got = NarrowBandPipeline(plan, rij, alpha=alpha, bucket_bands=True,
                                 bucket_ratio=1.3)
        assert len(got._buckets) > 1  # the plan must actually split
        r1 = ref.run_raw(st.data)
        r2 = got.run_raw(st.data)
        for k in ("vel", "baz", "mdccm", "sig_tau"):
            np.testing.assert_allclose(
                np.asarray(r1[k]), np.asarray(r2[k]), rtol=1e-4, atol=1e-5,
            )
        if alpha < 1.0:
            assert np.array_equal(np.asarray(r1["flags"]),
                                  np.asarray(r2["flags"]))


def test_bucketed_bands_with_lag_cap(small_stream):
    """Bucketing composes with the production max_lag_s cap."""
    from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    st = small_stream
    freqlist, nbands, _ = get_freqlist(0.3, 1.2, "log", 2)
    winlens = get_winlenlist("adaptive", nbands, 30, 35, 25)
    plan = make_plan(freqlist, "log", winlens, 0.5, st.npts, st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    full = NarrowBandPipeline(plan, rij, alpha=1.0)
    got = NarrowBandPipeline(plan, rij, alpha=1.0, bucket_bands=True,
                             max_lag_s=15.0)
    r1 = full.run_raw(st.data)
    r2 = got.run_raw(st.data)
    good = np.asarray(r1["mdccm"]) > 0.6
    np.testing.assert_allclose(
        np.asarray(r1["vel"])[good], np.asarray(r2["vel"])[good],
        rtol=1e-4, atol=1e-4,
    )


def test_strided_bucketed_matches_gather_bucketed(small_stream):
    """window_method='strided' composes with bucketing: exact equivalence."""
    from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    st = small_stream
    freqlist, nbands, _ = get_freqlist(0.3, 1.2, "log", 4)
    winlens = get_winlenlist("adaptive", nbands, 30, 40, 20)
    plan = make_plan(freqlist, "log", winlens, 0.5, st.npts, st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    for alpha in (1.0, 0.75):
        ref = NarrowBandPipeline(plan, rij, alpha=alpha)
        got = NarrowBandPipeline(plan, rij, alpha=alpha,
                                 window_method="strided")
        assert got.bucket_bands and len(got._buckets) > 1
        r1 = ref.run_raw(st.data)
        r2 = got.run_raw(st.data)
        for k in ("vel", "baz", "mdccm", "sig_tau"):
            np.testing.assert_allclose(
                np.asarray(r1[k]), np.asarray(r2[k]), rtol=1e-5, atol=1e-6,
            )
        if alpha < 1.0:
            assert np.array_equal(np.asarray(r1["flags"]),
                                  np.asarray(r2["flags"]))


class TestFusedMegakernel:
    """The Pallas megakernel (extract+spectra+xcorr+argmax in VMEM) must
    match the staged MXU pipeline end-to-end (interpret mode on CPU)."""

    @pytest.fixture(scope="class")
    def workload(self):
        from narrow_band_least_squares_tpu.io.synthetic import (
            synthetic_plane_wave,
        )
        from narrow_band_least_squares_tpu.utils.geometry import get_rij
        from narrow_band_least_squares_tpu.utils.plan import (
            get_freqlist, get_winlenlist, make_plan,
        )

        st = synthetic_plane_wave(
            nchans=6, duration_s=300, fs=10.0, baz_deg=200.0,
            trace_vel_kms=0.33, f0=0.6, bandwidth=0.8, snr=10, seed=3,
        )
        freqlist, nbands, _ = get_freqlist(0.2, 1.6, "log", 3)
        winlens = get_winlenlist("adaptive", nbands, 30, 40, 20)
        plan = make_plan(freqlist, "log", winlens, 0.5, st.npts, st.fs)
        rij = get_rij(st.latitudes, st.longitudes, st.nchans)
        return st, plan, rij

    def test_matches_mxu_pipeline(self, workload):
        from narrow_band_least_squares_tpu.models.narrowband import (
            NarrowBandPipeline,
        )

        st, plan, rij = workload
        pm = NarrowBandPipeline(plan, rij, filter_type="cheby1", alpha=1.0)
        pf = NarrowBandPipeline(
            plan, rij, filter_type="cheby1", alpha=1.0, xcorr_method="fused",
        )
        rm, rf = pm.run_raw(st.data), pf.run_raw(st.data)
        np.testing.assert_allclose(
            np.asarray(rm["vel"]), np.asarray(rf["vel"]), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(rm["baz"]), np.asarray(rf["baz"]), atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(rm["mdccm"]), np.asarray(rf["mdccm"]), atol=2e-5,
        )

    def test_mixed_length_bucket_last_windows(self):
        """Regression (ADVICE r3): in a bucket mixing window lengths, a
        shorter band's last valid windows start inside (T-Lg, T-Lb]; the
        kernel must clamp padded slots per band (T - Lb), not to the
        bucket template (T - Lg), or those real windows shift earlier."""
        from narrow_band_least_squares_tpu.io.synthetic import (
            synthetic_plane_wave,
        )
        from narrow_band_least_squares_tpu.models.narrowband import (
            NarrowBandPipeline,
        )
        from narrow_band_least_squares_tpu.utils.geometry import get_rij
        from narrow_band_least_squares_tpu.utils.plan import make_plan

        st = synthetic_plane_wave(
            nchans=5, duration_s=300, fs=10.0, baz_deg=200.0,
            trace_vel_kms=0.33, f0=0.6, bandwidth=0.8, snr=10, seed=3,
        )
        freqlist = [0.3, 0.7, 1.4]
        plan = make_plan(freqlist, "linear", [30, 29], 0.95, st.npts, st.fs)
        rij = get_rij(st.latitudes, st.longitudes, st.nchans)
        kw = dict(filter_type="cheby1", alpha=1.0, bucket_slack=4.0)
        pf = NarrowBandPipeline(plan, rij, xcorr_method="fused", **kw)
        # self-check the fixture really exercises the edge: one mixed
        # bucket, and the short band's last start falls past T - Lg
        assert len(pf._fused_buckets) == 1
        Lg = max(wp.winlensamp for wp in plan.windows)
        short = min(range(2), key=lambda b: plan.windows[b].winlensamp)
        wp = plan.windows[short]
        assert wp.winlensamp < Lg
        assert wp.starts[-1] > plan.npts - Lg
        pm = NarrowBandPipeline(plan, rij, **kw)
        rm, rf = pm.run_raw(st.data), pf.run_raw(st.data)
        np.testing.assert_allclose(
            np.asarray(rm["vel"]), np.asarray(rf["vel"]), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(rm["mdccm"]), np.asarray(rf["mdccm"]), atol=2e-5,
        )

    def test_multiarray_merge(self, workload):
        from narrow_band_least_squares_tpu.models.narrowband import (
            NarrowBandPipeline,
        )

        st, plan, rij = workload
        pf = NarrowBandPipeline(
            plan, rij, filter_type="cheby1", alpha=1.0, xcorr_method="fused",
        )
        batch = np.stack([st.data, st.data[:, ::-1]], axis=0)
        rb = pf.run_batch_raw(batch)
        r0 = pf.run_raw(st.data)
        np.testing.assert_allclose(
            np.asarray(rb["vel"][0]), np.asarray(r0["vel"]), atol=1e-5,
        )



class TestBandLimitedXcorr:
    """Opt-in DFT-bin restriction (band_limit_db): near-exact results at a
    fraction of the spectra/cross-spectra/inverse matmul cost."""

    def _workload(self):
        from narrow_band_least_squares_tpu.io.synthetic import (
            synthetic_plane_wave,
        )
        from narrow_band_least_squares_tpu.utils.geometry import get_rij
        from narrow_band_least_squares_tpu.utils.plan import (
            get_freqlist, get_winlenlist, make_plan,
        )

        st = synthetic_plane_wave(
            nchans=6, duration_s=600, fs=20.0, baz_deg=230.0,
            trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0, seed=42,
        )
        freqlist, nbands, _ = get_freqlist(0.1, 5.0, "log", 8)
        winlens = get_winlenlist("adaptive", nbands, 50, 60, 30)
        plan = make_plan(freqlist, "log", winlens, 0.5, st.npts, st.fs)
        rij = get_rij(st.latitudes, st.longitudes, st.nchans)
        return st, plan, rij

    def test_bins_shrink_for_low_bands(self):
        from narrow_band_least_squares_tpu.models.narrowband import (
            NarrowBandPipeline,
        )

        st, plan, rij = self._workload()
        exact = NarrowBandPipeline(plan, rij, alpha=1.0)
        lim = NarrowBandPipeline(plan, rij, alpha=1.0, band_limit_db=40.0)
        # the longest-window bucket holds the lowest bands: its K must
        # shrink hard (the 0.1-0.26 Hz bands need few of the ~Lmax bins)
        k_full = exact._buckets[0]["tables"]["Cf"].shape[1]
        k_lim = lim._buckets[0]["tables"]["Cf"].shape[1]
        assert k_lim < 0.5 * k_full, (k_lim, k_full)

    def test_results_match_exact_within_tolerance(self):
        from narrow_band_least_squares_tpu.models.narrowband import (
            NarrowBandPipeline,
        )

        st, plan, rij = self._workload()
        exact = NarrowBandPipeline(plan, rij, alpha=1.0)
        lim = NarrowBandPipeline(plan, rij, alpha=1.0, band_limit_db=40.0)
        a = {k: np.asarray(v) for k, v in exact.run_raw(st.data).items()}
        b = {k: np.asarray(v) for k, v in lim.run_raw(st.data).items()}
        good = a["mdccm"] > 0.5
        assert good.sum() > 20
        # integer-lag peaks: the overwhelming majority identical, rest
        # within one sample -> vel deviations stay tiny
        same_vel = np.mean(a["vel"][good] == b["vel"][good])
        assert same_vel > 0.95, same_vel
        np.testing.assert_allclose(
            a["vel"][good], b["vel"][good], rtol=0.02,
        )
        np.testing.assert_allclose(
            a["mdccm"][good], b["mdccm"][good], atol=0.02,
        )

    def test_ignored_without_filter_bank(self):
        from narrow_band_least_squares_tpu.models.narrowband import (
            NarrowBandPipeline,
        )

        st, plan, rij = self._workload()
        pipe = NarrowBandPipeline(
            plan, rij, alpha=1.0, apply_filter=False, band_limit_db=60.0,
        )
        assert pipe.band_limit_db == 0.0


def test_band_limit_auto_scales_with_bt():
    """'auto' keeps -40 dB for healthy-BT plans and tightens toward
    -90 dB for very-low-BT bands; the curve must dominate every measured
    requirement of the BT sweep by >= 5 dB (benchmarks/bench_bt_sweep.py,
    BENCH_BANDLIMIT.json bt_sweep)."""
    from narrow_band_least_squares_tpu.models.narrowband import (
        band_limit_auto_db,
    )

    assert band_limit_auto_db(5.0) == 40.0
    # measured minimum threshold for >=99% conf-window lag identity
    required = {1.5: 70.0, 2.0: 50.0, 2.5: 50.0, 3.0: 50.0,
                3.5: 40.0, 5.0: 40.0}
    for bt, need in required.items():
        assert band_limit_auto_db(bt) >= need + 5.0 or (
            need == 40.0 and band_limit_auto_db(bt) >= 40.0
        ), (bt, band_limit_auto_db(bt), need)
    low = band_limit_auto_db(1.3)
    assert band_limit_auto_db(2.0) < low <= 90.0
    assert band_limit_auto_db(0.01) == 90.0


@pytest.mark.parametrize("bt", [1.5, 2.0, 2.5, 3.0, 3.5, 5.0])
def test_band_limit_auto_meets_identity_target_on_bt_sweep(bt):
    """VERDICT r4 item 3: at every sweep BT, the auto threshold keeps
    confident-window lag identity high and cycle-skip-free vs the exact
    all-bins pipeline (same construction as benchmarks/bench_bt_sweep.py
    — contiguous linear bands of width BT/winlen — on a shorter stream;
    the >= 99% identity criterion itself is asserted at bench scale,
    BENCH_BANDLIMIT.json bt_sweep auto_meets_target, where the window
    sample is 2x this test's ~150 and single-lag flips average out)."""
    from narrow_band_least_squares_tpu.io.synthetic import (
        synthetic_plane_wave,
    )
    from narrow_band_least_squares_tpu.models.narrowband import (
        NarrowBandPipeline,
    )
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import make_plan

    fs, winlen = 20.0, 30.0
    st = synthetic_plane_wave(
        nchans=8, duration_s=600.0, fs=fs, baz_deg=230.0,
        trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0, seed=42,
    )
    bw = bt / winlen
    freqlist = [0.45 + k * bw for k in range(5)]
    plan = make_plan(freqlist, "linear", [winlen] * 4, 0.5, st.npts, fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    exact = NarrowBandPipeline(plan, rij, alpha=1.0)
    auto = NarrowBandPipeline(plan, rij, alpha=1.0, band_limit_db="auto")
    a = {k: np.asarray(v) for k, v in exact.run_raw(st.data).items()}
    b = {k: np.asarray(v) for k, v in auto.run_raw(st.data).items()}
    good = a["mdccm"] > 0.6
    assert good.sum() > 40
    ident = float(np.mean(a["vel"][good] == b["vel"][good]))
    assert ident >= 0.97, (bt, ident)
    # residual flips are single-lag, not cycle skips
    assert np.max(np.abs(a["vel"][good] - b["vel"][good])) < 0.01


def test_band_limit_auto_pipeline(small_stream):
    from narrow_band_least_squares_tpu.models.narrowband import (
        NarrowBandPipeline,
    )
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    st = small_stream
    freqlist, nbands, _ = get_freqlist(0.3, 1.2, "log", 2)
    winlens = get_winlenlist("constant", nbands, 30, 0, 0)
    plan = make_plan(freqlist, "log", winlens, 0.5, st.npts, st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    exact = NarrowBandPipeline(plan, rij, alpha=1.0)
    auto = NarrowBandPipeline(plan, rij, alpha=1.0, band_limit_db="auto")
    a = exact.run_raw(st.data)
    b = auto.run_raw(st.data)
    good = np.asarray(a["mdccm"]) > 0.6
    np.testing.assert_allclose(
        np.asarray(a["vel"])[good], np.asarray(b["vel"])[good], rtol=0.02,
    )
