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

from typing import Dict, Tuple

import numpy as np

import jax
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


def band_limit_bins(
    sos_list, band_idx, nfft: int, fs: float, limit_db: float,
    zerophase: bool = False,
) -> Tuple[int, int]:
    """Contiguous DFT-bin range covering the bands' filter passbands.

    Returns (kmin, kmax) such that every bin where ANY of the bands'
    magnitude responses exceeds ``-limit_db`` dB of the group peak is
    inside the range.  Used by the opt-in band-limited xcorr: a
    bandpass-filtered signal's spectrum is concentrated in the passband,
    so the forward/inverse DFT matmuls only need those rows — the
    DFT-as-matmul form subsets bins for free, which an FFT cannot.
    Low-frequency bands (the long-window, expensive ones) keep a few
    percent of their bins at -60 dB; the dropped stopband bins carry the
    filter's stopband leakage plus the rectangular-window truncation
    sidelobes, which bounds the cc error at the same level.
    """
    from scipy import signal as _sig

    K = nfft // 2 + 1
    freqs = np.arange(K) * fs / nfft
    mag = np.zeros(K)
    for b in band_idx:
        _, h = _sig.sosfreqz(sos_list[int(b)], worN=freqs, fs=fs)
        m = np.abs(h)
        if zerophase:
            m = m * m
        mag = np.maximum(mag, m)
    thresh = mag.max() * 10.0 ** (-float(limit_db) / 20.0)
    keep = np.flatnonzero(mag >= thresh)
    if len(keep) == 0:
        return 0, K - 1
    return int(keep[0]), int(keep[-1])


def slice_tables_bins(tab: Dict[str, np.ndarray], kmin: int, kmax: int
                      ) -> Dict[str, np.ndarray]:
    """Restrict DFT matmul tables to bin rows [kmin, kmax]."""
    K = tab["Cf"].shape[1]
    kmax = min(kmax, K - 1)
    sl = slice(kmin, kmax + 1)
    out = dict(tab)
    out["Cf"] = tab["Cf"][:, sl]
    out["Sf"] = tab["Sf"][:, sl]
    out["Ec"] = tab["Ec"][sl]
    out["Es"] = tab["Es"][sl]
    return out


# --------------------------------------------------------------------------
# MXU path: DFT-as-matmul cross-correlation
# --------------------------------------------------------------------------
#
# XLA's FFT on TPU underuses the MXU; the whole transform chain here is
# small enough to write as explicit (real) DFT matmuls instead, which run at
# matmul speed on the systolic array:
#
#   spectra:      F = win @ [C_f | S_f]          (L x K cos/sin tables)
#   cross-spec:   CS = F_j * conj(F_i)           (elementwise, VPU)
#   correlation:  cc = Re(CS) @ E_c - Im(CS) @ E_s   (K x nlag tables)
#
# with nfft any integer >= 2*Lmax - 1 (no power-of-2 constraint) and the
# inverse evaluated ONLY at the 2*Lmax-1 physical lags.  Numerically this is
# the same circular-correlation identity the FFT path uses; tables are built
# in float64 on host and cast to the compute dtype.

def precompute_dft_tables(Lmax: int, dtype=np.float32,
                          nfft: int | None = None,
                          max_lag: int | None = None) -> Dict[str, np.ndarray]:
    """DFT matmul tables.  ``max_lag`` restricts the evaluated lag range to
    ``[-max_lag, max_lag]`` (production mode: the physical inter-element
    delay is bounded by aperture / min trace velocity, so the full
    ``2*Lmax-1`` search the reference does is mostly dead lags)."""
    n = int(nfft) if nfft else 2 * Lmax  # >= 2*Lmax - 1
    K = n // 2 + 1
    t = np.arange(Lmax)[:, None]                    # (L, 1)
    k = np.arange(K)[None, :]                       # (1, K)
    ang_f = 2.0 * np.pi * t * k / n
    Cf = np.cos(ang_f)
    Sf = np.sin(ang_f)

    half = Lmax - 1 if max_lag is None else min(int(max_lag), Lmax - 1)
    lags = np.arange(-half, half + 1)               # ascending, 'full' order
    m = np.mod(lags, n)[None, :]                    # (1, nlag)
    w = np.full((K, 1), 2.0)
    w[0, 0] = 1.0
    if n % 2 == 0:
        w[-1, 0] = 1.0
    ang_i = 2.0 * np.pi * np.arange(K)[:, None] * m / n
    Ec = (w / n) * np.cos(ang_i)
    Es = (w / n) * np.sin(ang_i)
    # NOTE a stacked [Ec; -Es] single-dot inverse over [ReCS | ImCS] was
    # measured on v5e and REJECTED: XLA materializes the concatenated
    # cross-spectra as a real copy (canonical OLS 4.58 -> 5.0 ms), so the
    # two-dot form with separate Re/Im operands stays (BENCH_LAGTILE2).
    return {
        "Cf": Cf.astype(dtype), "Sf": Sf.astype(dtype),
        "Ec": Ec.astype(dtype), "Es": Es.astype(dtype),
        "nfft": n, "lag_min": int(lags[0]),
    }


def cross_correlate_mxu(
    win: jnp.ndarray,        # (B, W, C, Lmax) demeaned, zero-padded windows
    pairs: jnp.ndarray,      # (P, 2) int32
    lag_mask: jnp.ndarray,   # (B, 2*Lmax-1) bool
    tables: Dict[str, jnp.ndarray],
    fs: float,
    precision=jax.lax.Precision.HIGHEST,
    subsample: bool = False,
    lag_tile: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MXU cross-correlation; same contract as `cross_correlate`.

    ``lag_tile`` tiles the lag (output-column) axis of the inverse-DFT
    matmul and folds the masked first-max argmax into a running
    (max, argmax) across tiles, so the ``(B, W, P, nlag)`` correlation
    tensor never materializes in HBM — only ``(B, W, P, lag_tile)`` slices
    that XLA keeps fusion-local.  The delays stage is HBM-bound (v5e:
    ~79% of the canonical OLS step's bytes), and writing + re-reading the
    full cc tensor was the single largest term; each tile's cc values are
    the same contraction over K at the same precision, and the
    strictly-greater running compare preserves the reference's
    ascending-lag first-max tie-break (oracle._xcorr_delays), so tau/rho
    are bit-identical to the untiled program.  ``0`` disables.

    ``subsample=True`` refines each integer-lag peak with the parabolic
    vertex through its two neighbors (classic three-point interpolation) —
    a beyond-reference extension (the reference quantizes delays to the
    sample grid); off by default for parity.  The refinement composes with
    lag tiling (VERDICT r4 item 4): the running (max, argmax) additionally
    carries the two neighbor cc values.  The left neighbor of a tile-edge
    peak is the previous tile's last column (one (B, W, P) carry); the
    right neighbor of a tile-edge peak is unknown until the next tile, so
    it is patched from that tile's first column before the running compare
    (``best_idx == t0 - 1`` identifies exactly the carried-over case).
    Global-boundary peaks (k = 0 or nlag-1) take frac = 0, same as the
    untiled path, so their placeholder neighbors are never consumed.
    Measured on v5e (canonical workload): tau — integer peak AND
    parabolic frac — is BITWISE identical to the untiled subsample path
    (the per-tile cc columns are the same contractions at the same
    precision); mdccm/sig_tau can differ by 1 ulp (~1e-7) because XLA
    fuses the rho normalization into a different context per program
    shape.
    """
    B, W, C, Lmax = win.shape
    energy = jnp.sum(win * win, axis=-1)

    mm = lambda a, b, p: jnp.dot(a, b, precision=p,
                                 preferred_element_type=jnp.float32)
    flat = win.reshape(B * W * C, Lmax)
    ReF = mm(flat, tables["Cf"], precision).reshape(B, W, C, -1)
    ImF = (-mm(flat, tables["Sf"], precision)).reshape(B, W, C, -1)

    ReI, ImI = ReF[:, :, pairs[:, 0], :], ImF[:, :, pairs[:, 0], :]
    ReJ, ImJ = ReF[:, :, pairs[:, 1], :], ImF[:, :, pairs[:, 1], :]
    ReCS = ReJ * ReI + ImJ * ImI                     # F_j * conj(F_i)
    ImCS = ImJ * ReI - ReJ * ImI

    K = ReCS.shape[-1]
    P = pairs.shape[0]
    nlag = tables["Ec"].shape[-1]
    lag_min = tables.get("lag_min", -(Lmax - 1))
    ReCS2 = ReCS.reshape(-1, K)
    ImCS2 = ImCS.reshape(-1, K)
    inv = lambda t0, t1: (
        mm(ReCS2, tables["Ec"][:, t0:t1], precision)
        - mm(ImCS2, tables["Es"][:, t0:t1], precision)
    )

    if lag_tile and lag_tile < nlag:
        best_val = jnp.full((B, W, P), -jnp.inf, jnp.float32)
        best_idx = jnp.zeros((B, W, P), jnp.int32)
        if subsample:
            best_m = jnp.zeros((B, W, P), jnp.float32)   # cc at k-1
            best_p = jnp.zeros((B, W, P), jnp.float32)   # cc at k+1
            prev_last = jnp.zeros((B, W, P), jnp.float32)  # cc at t0-1
        for t0 in range(0, nlag, lag_tile):
            t1 = min(t0 + lag_tile, nlag)
            tlen = t1 - t0
            cc_t = inv(t0, t1).reshape(B, W, P, tlen)
            cc_m = jnp.where(
                lag_mask[:, None, None, t0:t1], cc_t, -jnp.inf
            )
            pk = jnp.max(cc_m, axis=-1)
            kl = jnp.argmax(cc_m, axis=-1).astype(jnp.int32)
            ki = kl + t0
            if subsample:
                # Patch the right neighbor of a previous-tile-edge best
                # before this tile can overwrite it.
                if t0 > 0:
                    best_p = jnp.where(
                        best_idx == t0 - 1, cc_t[..., 0], best_p
                    )
                # neighbor extraction as masked reductions (one-hot
                # compare + sum) — fuses into the tile's elementwise
                # pipeline, unlike take_along_axis gathers (measured 2x
                # the whole subsample overhead on v5e)
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (B, W, P, tlen), 3
                )
                cm_t = jnp.sum(
                    jnp.where(iota == (kl - 1)[..., None], cc_t, 0.0),
                    axis=-1,
                )  # kl == 0 -> 0.0 placeholder (left-patched below)
                cp_t = jnp.sum(
                    jnp.where(iota == (kl + 1)[..., None], cc_t, 0.0),
                    axis=-1,
                )  # kl == tlen-1 -> placeholder, patched next tile
                if t0 > 0:
                    cm_t = jnp.where(kl == 0, prev_last, cm_t)
                prev_last = cc_t[..., -1]
            take = pk > best_val
            best_val = jnp.where(take, pk, best_val)
            best_idx = jnp.where(take, ki, best_idx)
            if subsample:
                best_m = jnp.where(take, cm_t, best_m)
                best_p = jnp.where(take, cp_t, best_p)
        peak = best_val
        k_idx = best_idx
        if subsample:
            denom = best_m - 2.0 * peak + best_p
            frac = jnp.where(
                (jnp.abs(denom) > 1e-20) & (k_idx > 0) & (k_idx < nlag - 1),
                0.5 * (best_m - best_p) / denom,
                0.0,
            )
            frac = jnp.clip(frac, -0.5, 0.5)
        else:
            frac = 0.0
    else:
        cc_lin = inv(0, nlag).reshape(B, W, P, -1)   # (B, W, P, nlag)
        mask = lag_mask[:, None, None, :]
        cc_masked = jnp.where(mask, cc_lin, -jnp.inf)
        k_idx = jnp.argmax(cc_masked, axis=-1)
        peak = jnp.max(cc_masked, axis=-1)
        frac = 0.0
        if subsample:
            km = jnp.clip(k_idx - 1, 0, nlag - 1)
            kp = jnp.clip(k_idx + 1, 0, nlag - 1)
            cm = jnp.take_along_axis(cc_lin, km[..., None], axis=-1)[..., 0]
            cp = jnp.take_along_axis(cc_lin, kp[..., None], axis=-1)[..., 0]
            denom = cm - 2.0 * peak + cp
            frac = jnp.where(
                (jnp.abs(denom) > 1e-20) & (k_idx > 0) & (k_idx < nlag - 1),
                0.5 * (cm - cp) / denom,
                0.0,
            )
            frac = jnp.clip(frac, -0.5, 0.5)
    tau = (k_idx.astype(win.dtype) + frac + lag_min) / fs

    Ei = energy[:, :, pairs[:, 0]]
    Ej = energy[:, :, pairs[:, 1]]
    denom = jnp.sqrt(Ei * Ej)
    rho = jnp.where(denom > 0, peak / denom, 0.0)
    mdccm = jnp.median(rho, axis=-1)
    return tau, rho, mdccm


def precompute_pallas_tables(
    Lmax: int, band_lengths: np.ndarray, dtype=np.float32,
    max_lag: int | None = None,
) -> Dict[str, np.ndarray]:
    """Stacked/padded DFT tables + per-band lag bounds for the fused kernel.

    ``max_lag`` caps the evaluated lag range to ``[-max_lag, max_lag]``
    (production mode), exactly like `precompute_dft_tables`."""
    half = Lmax - 1 if max_lag is None else min(int(max_lag), Lmax - 1)
    tab = precompute_dft_tables(Lmax, dtype, max_lag=half)
    K = tab["Cf"].shape[1]
    nlag = 2 * half + 1
    K2 = 2 * K
    K2p = _round_up_128(K2)
    e2 = np.zeros((K2p, nlag), dtype=dtype)
    e2[:K] = tab["Ec"]
    e2[K:K2] = -tab["Es"]
    bh = np.minimum(np.asarray(band_lengths) - 1, half)            # (B,)
    lo = (half - bh).astype(np.int32)
    hi = (half + bh).astype(np.int32)
    return {
        "Cf": tab["Cf"], "Sf": tab["Sf"], "e2": e2,
        "K": K, "K2p": K2p, "nlag": nlag, "lag_min": -half,
        "lo": lo, "hi": hi,
    }


def _round_up_128(x: int) -> int:
    return ((x + 127) // 128) * 128


def cross_correlate_pallas(
    win: jnp.ndarray,        # (B, W, C, Lmax)
    pairs: jnp.ndarray,      # (P, 2)
    tables: Dict,            # precompute_pallas_tables (device arrays)
    fs: float,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused-kernel cross-correlation; same contract as `cross_correlate`."""
    from narrow_band_least_squares_tpu.ops.kernels import icorr_peak

    B, W, C, Lmax = win.shape
    P = pairs.shape[0]
    K = tables["K"]
    K2p = tables["K2p"]
    energy = jnp.sum(win * win, axis=-1)

    mm = lambda a, b: jnp.dot(a, b, precision=precision,
                              preferred_element_type=jnp.float32)
    flat = win.reshape(B * W * C, Lmax)
    ReF = mm(flat, tables["Cf"]).reshape(B, W, C, K)
    ImF = (-mm(flat, tables["Sf"])).reshape(B, W, C, K)
    ReI, ImI = ReF[:, :, pairs[:, 0], :], ImF[:, :, pairs[:, 0], :]
    ReJ, ImJ = ReF[:, :, pairs[:, 1], :], ImF[:, :, pairs[:, 1], :]
    ReCS = ReJ * ReI + ImJ * ImI
    ImCS = ImJ * ReI - ReJ * ImI

    R = B * W * P
    cs2 = jnp.concatenate([ReCS, ImCS], axis=-1).reshape(R, 2 * K)
    cs2 = jnp.pad(cs2, ((0, 0), (0, K2p - 2 * K)))
    lo = jnp.broadcast_to(
        tables["lo"][:, None, None], (B, W, P)
    ).reshape(R, 1)
    hi = jnp.broadcast_to(
        tables["hi"][:, None, None], (B, W, P)
    ).reshape(R, 1)
    peak, idx = icorr_peak(
        cs2, tables["e2"], lo, hi, tables["nlag"], interpret=interpret,
        precision=precision,
    )
    peak = peak.reshape(B, W, P)
    idx = idx.reshape(B, W, P)
    lag_min = tables.get("lag_min", -(Lmax - 1))
    tau = (idx.astype(win.dtype) + lag_min) / fs

    Ei = energy[:, :, pairs[:, 0]]
    Ej = energy[:, :, pairs[:, 1]]
    denom = jnp.sqrt(Ei * Ej)
    rho = jnp.where(denom > 0, peak / denom, 0.0)
    mdccm = jnp.median(rho, axis=-1)
    return tau, rho, mdccm
