"""Filter bank: SOS design on host, application on device.

The reference filters the full broadband stream once per band with SciPy
(causal `sosfilt` for cheby1, ObsPy two-pass zero-phase for butter; reference
``helpers.py:108-141``), re-reading the raw data for every band.

TPU-native design: an IIR recurrence is a length-T sequential dependency —
the worst possible shape for a vector machine.  Instead the filter is applied
**exactly** in the frequency domain: the SOS cascade's impulse response is
computed once on host (float64, SciPy) and truncated where it has decayed
below float32 resolution, making the IIR a finite convolution; the raw
waveform is FFT'd once and multiplied by the whole bank of band responses at
once, giving all B bands in one fused, embarrassingly-parallel pass with no
recurrence and no per-band re-reads.  Zero-phase (butter) filtering is the
finite two-pass (forward, truncate, time-reverse, forward) as one extra
FFT pair — exactly ObsPy's ``zerophase=True`` semantics including the
truncated trailing-edge ringing.

A `lax.scan` reference implementation of the exact recurrence is kept for
cross-checks and for platforms where the impulse-response length would rival
the signal length.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy import signal

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Host-side design (SciPy; runs once per plan)
# --------------------------------------------------------------------------

def design_sos(filter_type: str, fmin: float, fmax: float, order: int,
               ripple: float, fs: float) -> np.ndarray:
    """Bandpass SOS design matching reference ``helpers.py:128,130``."""
    if not (0.0 < fmin < fmax < fs / 2):
        raise ValueError(
            f"band edges must satisfy 0 < FMIN < FMAX < Nyquist: "
            f"FMIN={fmin}, FMAX={fmax}, fs={fs} (Nyquist {fs / 2}); the "
            f"reference notes FMAX 'should not exceed Nyquist' (example.py:51)"
        )
    if filter_type == "butter":
        return signal.iirfilter(
            order, [fmin, fmax], btype="band", ftype="butter", fs=fs,
            output="sos",
        )
    if filter_type == "cheby1":
        return signal.iirfilter(
            order, [fmin, fmax], rp=ripple, btype="band", analog=False,
            ftype="cheby1", fs=fs, output="sos",
        )
    raise ValueError(f"Unknown FILTER_TYPE {filter_type!r}")


def impulse_response(sos: np.ndarray, length: int) -> np.ndarray:
    """Float64 impulse response of the SOS cascade, length samples."""
    x = np.zeros(length)
    x[0] = 1.0
    return signal.sosfilt(sos, x)


def impulse_length(sos: np.ndarray, max_length: int,
                   rel_tol: float = 1e-7) -> int:
    """Samples until the impulse response decays below rel_tol of its peak.

    Capped at ``max_length`` (the signal length): beyond that a longer
    response cannot change the output within the signal support.
    """
    h = impulse_response(sos, max_length)
    peak = np.max(np.abs(h))
    if peak == 0.0:
        return 1
    above = np.nonzero(np.abs(h) > rel_tol * peak)[0]
    return int(above[-1]) + 1 if len(above) else 1


def taper_window(npts: int, max_percentage: float = 0.01) -> np.ndarray:
    """Two-sided Hann taper (ObsPy ``taper(max_percentage=0.01)`` semantics,
    applied at reference ``helpers.py:139``)."""
    wlen = int(npts * max_percentage)
    taper = np.ones(npts)
    if wlen > 0:
        sides = np.hanning(2 * wlen + 1)
        taper[:wlen] = sides[:wlen]
        taper[npts - wlen:] = sides[wlen + 1:]
    return taper


def next_pow2(n: int) -> int:
    return 1 << (int(n - 1)).bit_length()


def build_filter_bank(
    band_edges: list,
    filter_type: str,
    order: int,
    ripple: float,
    fs: float,
    npts: int,
    rel_tol: float = 1e-7,
) -> Tuple[np.ndarray, list, int]:
    """Design all narrow-band filters and tabulate their impulse responses.

    Returns ``(h_bank (B, L) float64, sos_list, L)`` where L is the longest
    needed impulse length across bands (the low bands ring longest).
    """
    sos_list = [
        design_sos(filter_type, lo, hi, order, ripple, fs)
        for (lo, hi) in band_edges
    ]
    lengths = [impulse_length(s, npts, rel_tol) for s in sos_list]
    L = max(lengths)
    h_bank = np.stack([impulse_response(s, L) for s in sos_list])
    return h_bank, sos_list, L


# --------------------------------------------------------------------------
# Device-side application
# --------------------------------------------------------------------------

def filter_bank_fft(
    x: jnp.ndarray,          # (C, T) raw waveforms
    h_bank: jnp.ndarray,     # (B, L) impulse responses
    taper: Optional[jnp.ndarray],  # (T,) or None (sharded path tapers later)
    nfft: int,               # static, >= next_pow2(T + L)
    zerophase: bool,         # butter: finite two-pass; cheby1: causal H
) -> jnp.ndarray:
    """All bands at once: y[b, c] = taper * (x[c] * h[b]) (linear convolution).

    One forward FFT of the data feeds every band — the reference instead
    re-filters the raw stream per band (``narrow_band_least_squares.py:77``).
    Zero-phase mode reproduces ObsPy's FINITE two-pass exactly (reference
    ``helpers.py:127``: ``sosfilt`` forward, truncate to the array, reverse,
    ``sosfilt``, reverse): the first causal pass is truncated to the T
    finite samples before the time-reversed second pass, so the trailing-
    edge ringing energy ObsPy discards is discarded here too.  (Rounds
    <= 4 applied |H|^2 — the infinitely-padded two-pass — which deviated
    from ObsPy within one impulse length of the trailing edge; the one
    extra FFT pair closes that last numerical-contract gap for ~2x the
    filter-stage cost on butter plans only.)
    """
    T = x.shape[-1]
    Xf = jnp.fft.rfft(x, n=nfft, axis=-1)          # (C, F)
    Hf = jnp.fft.rfft(h_bank, n=nfft, axis=-1)     # (B, F)
    Yf = Xf[None, :, :] * Hf[:, None, :]           # (B, C, F)
    y = jnp.fft.irfft(Yf, n=nfft, axis=-1)[..., :T]
    if zerophase:
        # second causal pass over the time-reversed finite first pass
        Y2 = jnp.fft.rfft(y[..., ::-1], n=nfft, axis=-1)
        y = jnp.fft.irfft(
            Y2 * Hf[:, None, :], n=nfft, axis=-1
        )[..., :T][..., ::-1]
    if taper is not None:
        y = y * taper[None, None, :]
    return y


def sosfilt_scan(sos: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Exact SOS recurrence (transposed direct-form II) via lax.scan.

    ``sos``: (S, 6); ``x``: (..., T).  Bit-matches scipy.signal.sosfilt up to
    dtype.  Kept as the cross-check / fallback path for `filter_bank_fft`.
    """
    S = sos.shape[0]
    batch_shape = x.shape[:-1]
    xf = x.reshape((-1, x.shape[-1]))  # (N, T)
    N = xf.shape[0]

    b0 = sos[:, 0][:, None]
    b1 = sos[:, 1][:, None]
    b2 = sos[:, 2][:, None]
    a1 = sos[:, 4][:, None]
    a2 = sos[:, 5][:, None]

    def step(carry, xt):
        # carry: (z1, z2) each (S, N); xt: (N,)
        z1, z2 = carry
        y = xt
        # cascade the sections sequentially (S is small and static)
        new_z1 = []
        new_z2 = []
        for s in range(S):
            ys = b0[s] * y + z1[s]
            new_z1.append(b1[s] * y - a1[s] * ys + z2[s])
            new_z2.append(b2[s] * y - a2[s] * ys)
            y = ys
        return (jnp.stack(new_z1), jnp.stack(new_z2)), y

    z0 = (jnp.zeros((S, N), x.dtype), jnp.zeros((S, N), x.dtype))
    _, ys = jax.lax.scan(step, z0, xf.T)           # ys: (T, N)
    return ys.T.reshape(batch_shape + (x.shape[-1],))


def filter_stream_scan(
    x: jnp.ndarray, sos: jnp.ndarray, taper: jnp.ndarray, zerophase: bool
) -> jnp.ndarray:
    """Single-band exact filtering via the scan recurrence + taper."""
    y = sosfilt_scan(sos, x)
    if zerophase:
        y = sosfilt_scan(sos, y[..., ::-1])[..., ::-1]
    return y * taper


def sosfreqz_bank(sos_list, freq_resp_list: np.ndarray, fs: float):
    """Per-band complex frequency responses (host, SciPy).

    Mirrors the ``signal.sosfreqz(sos, freq_resp_list, fs=Fs)`` calls the
    reference makes per band (``narrow_band_least_squares.py:78``), returning
    complex (B, F) arrays with the reference's dtype convention.
    """
    B = len(sos_list)
    F = len(freq_resp_list)
    w_array = np.zeros((B, F), dtype=complex)
    h_array = np.zeros((B, F), dtype=complex)
    for b, sos in enumerate(sos_list):
        w, h = signal.sosfreqz(sos, freq_resp_list, fs=fs)
        w_array[b] = w
        h_array[b] = h
    return w_array, h_array
