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
