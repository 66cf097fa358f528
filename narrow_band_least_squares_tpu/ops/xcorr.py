"""Batched inter-element delay estimation via FFT cross-correlation.

The reference's solver cross-correlates each of the n(n-1)/2 element pairs
per window in a Python loop (SURVEY §3.4).  Here every (band, window, pair)
cell is one lane of a single batched rFFT -> cross-spectrum -> irFFT ->
masked-argmax computation.

Conventions (identical to oracle._xcorr_delays):
    cc_p(l) = sum_t x_j(t + l) * x_i(t),  l in [-(Lmax-1), Lmax-1] ascending,
    tau_p = argmax_l cc_p(l) / fs  (first max wins on ties),
    rho_p = cc_p(l*) / sqrt(E_i * E_j)   (windows pre-demeaned),
    MdCCM = median_p rho_p.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp


def cross_correlate(
    win: jnp.ndarray,        # (B, W, C, Lmax) demeaned, zero-padded windows
    pairs: jnp.ndarray,      # (P, 2) int32
    lag_mask: jnp.ndarray,   # (B, 2*Lmax-1) bool
    nfft: int,               # static, >= 2*Lmax
    fs: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (tau (B,W,P) [s], rho (B,W,P), mdccm (B,W))."""
    B, W, C, Lmax = win.shape
    energy = jnp.sum(win * win, axis=-1)               # (B, W, C)

    Wf = jnp.fft.rfft(win, n=nfft, axis=-1)            # (B, W, C, F)
    Fi = Wf[:, :, pairs[:, 0], :]                      # (B, W, P, F)
    Fj = Wf[:, :, pairs[:, 1], :]
    cs = Fj * jnp.conj(Fi)
    cc = jnp.fft.irfft(cs, n=nfft, axis=-1)            # circular lags

    # circular -> linear 'full' ordering: [-(Lmax-1) .. Lmax-1]
    neg = cc[..., nfft - (Lmax - 1):]
    pos = cc[..., :Lmax]
    cc_lin = jnp.concatenate([neg, pos], axis=-1)      # (B, W, P, 2*Lmax-1)

    mask = lag_mask[:, None, None, :]
    cc_masked = jnp.where(mask, cc_lin, -jnp.inf)
    k = jnp.argmax(cc_masked, axis=-1)                 # (B, W, P), first max
    peak = jnp.max(cc_masked, axis=-1)
    lag = k.astype(win.dtype) - (Lmax - 1)
    tau = lag / fs

    Ei = energy[:, :, pairs[:, 0]]
    Ej = energy[:, :, pairs[:, 1]]
    denom = jnp.sqrt(Ei * Ej)
    rho = jnp.where(denom > 0, peak / denom, 0.0)

    mdccm = jnp.median(rho, axis=-1)                   # (B, W)
    return tau, rho, mdccm
