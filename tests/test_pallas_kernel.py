"""Pallas fused icorr+peak kernel: interpreter-mode correctness vs MXU path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from narrow_band_least_squares_tpu.ops import xcorr as XC
from narrow_band_least_squares_tpu.utils.geometry import pair_indices


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(9)
    B, W, C = 2, 4, 4
    lengths = np.array([100, 60], dtype=np.int32)  # per-band winlensamp
    Lmax = int(lengths.max())
    win = rng.standard_normal((B, W, C, Lmax))
    for b, L in enumerate(lengths):
        win[b, :, :, L:] = 0.0
    win -= win.mean(axis=-1, keepdims=True) * (win != 0)
    pairs = pair_indices(C)
    lags = np.arange(-(Lmax - 1), Lmax)
    lag_mask = np.stack([np.abs(lags) <= L - 1 for L in lengths])
    return (jnp.asarray(win, jnp.float32), jnp.asarray(pairs),
            jnp.asarray(lag_mask), lengths, Lmax)


def test_pallas_matches_mxu(batch):
    win, pairs, lag_mask, lengths, Lmax = batch
    fs = 10.0
    tab_m = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
             for k, v in XC.precompute_dft_tables(Lmax, np.float32).items()}
    tau_m, rho_m, md_m = XC.cross_correlate_mxu(win, pairs, lag_mask, tab_m, fs)

    tab_p = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
             for k, v in XC.precompute_pallas_tables(Lmax, lengths).items()}
    tau_p, rho_p, md_p = XC.cross_correlate_pallas(
        win, pairs, tab_p, fs, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(tau_m), np.asarray(tau_p))
    np.testing.assert_allclose(np.asarray(rho_m), np.asarray(rho_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(md_m), np.asarray(md_p),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_pallas_method(small_stream):
    """End-to-end pipeline with xcorr_method='pallas' (interpreted on CPU)."""
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

    ref = NarrowBandPipeline(plan, rij, alpha=1.0, xcorr_method="mxu")
    got = NarrowBandPipeline(plan, rij, alpha=1.0, xcorr_method="pallas")
    r1 = ref.run_raw(st.data)
    r2 = got.run_raw(st.data)
    np.testing.assert_allclose(np.asarray(r1["vel"]), np.asarray(r2["vel"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r1["mdccm"]), np.asarray(r2["mdccm"]),
                               rtol=1e-4, atol=1e-4)


def test_pipeline_pallas_bucketed_adaptive(small_stream):
    """Bucketed pallas path (multiple winlen buckets + lag cap) == mxu."""
    from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    st = small_stream
    freqlist, nbands, _ = get_freqlist(0.3, 1.5, "log", 4)
    winlens = get_winlenlist("adaptive", nbands, 0, 40, 20)
    plan = make_plan(freqlist, "log", winlens, 0.5, st.npts, st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)

    for max_lag_s in (None, 1.5):
        ref = NarrowBandPipeline(plan, rij, alpha=1.0, xcorr_method="mxu",
                                 max_lag_s=max_lag_s)
        got = NarrowBandPipeline(plan, rij, alpha=1.0, xcorr_method="pallas",
                                 max_lag_s=max_lag_s)
        assert got.bucket_bands and len(got._buckets) > 1
        r1 = ref.run_raw(st.data)
        r2 = got.run_raw(st.data)
        np.testing.assert_allclose(np.asarray(r1["vel"]), np.asarray(r2["vel"]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(r1["baz"]), np.asarray(r2["baz"]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(r1["mdccm"]),
                                   np.asarray(r2["mdccm"]),
                                   rtol=1e-4, atol=1e-4)
