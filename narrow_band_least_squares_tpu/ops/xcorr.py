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


def exact_peak_refine(
    win: jnp.ndarray,        # (B, W, C, Lmax) demeaned, zero-padded windows
    pairs: jnp.ndarray,      # (P, 2)
    k_idx: jnp.ndarray,      # (B, W, P) argmax index into the lag axis
    lag_min: int,            # lag of index 0
    lag_half: jnp.ndarray,   # (B,) max |lag| per band (winlen-1, capped)
    refine: int = 1,         # also test +-refine neighbor lags
    subsample: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact time-domain re-evaluation of the correlation peak.

    Recomputes cc(l) = sum_t x_j(t+l) x_i(t) in float32 at the candidate lag
    and its ``refine`` neighbors, re-argmaxes locally, and returns
    (peak value, lag [samples, float]).  This makes a low-precision (bf16)
    matmul search safe: the cheap pass only has to get the peak to within
    ``refine`` samples; the returned rho/tau are exact at the chosen lag.
    With ``subsample`` the three exact values around the winner give the
    parabolic-vertex fractional lag.
    """
    B, W, C, L = win.shape
    xi = win[:, :, pairs[:, 0], :]                      # (B, W, P, L)
    xj = win[:, :, pairs[:, 1], :]
    xj_pad = jnp.pad(xj, ((0, 0), (0, 0), (0, 0), (L, L)))
    half = lag_half[:, None, None]                      # (B, 1, 1)
    base = jnp.clip(k_idx + lag_min, -half, half)
    t = jnp.arange(L, dtype=jnp.int32)

    def cc_at(lag):
        idx = lag[..., None] + L + t                    # (B, W, P, L)
        shifted = jnp.take_along_axis(xj_pad, idx, axis=-1)
        return jnp.sum(shifted * xi, axis=-1)

    offs = list(range(-refine, refine + 1))
    vals = []
    lags = []
    for off in offs:
        lag = jnp.clip(base + off, -half, half)
        lags.append(lag)
        vals.append(cc_at(lag))
    stacked = jnp.stack(vals, axis=0)                   # (2r+1, B, W, P)
    lag_stack = jnp.stack(lags, axis=0)
    kbest = jnp.argmax(stacked, axis=0)                 # (B, W, P)
    peak = jnp.max(stacked, axis=0)
    lag_best = jnp.take_along_axis(lag_stack, kbest[None], axis=0)[0]
    frac = 0.0
    if subsample:
        n = len(offs)
        km = jnp.clip(kbest - 1, 0, n - 1)
        kp = jnp.clip(kbest + 1, 0, n - 1)
        cm = jnp.take_along_axis(stacked, km[None], axis=0)[0]
        cp = jnp.take_along_axis(stacked, kp[None], axis=0)[0]
        denom = cm - 2.0 * peak + cp
        frac = jnp.where(
            (jnp.abs(denom) > 1e-20) & (kbest > 0) & (kbest < n - 1),
            0.5 * (cm - cp) / denom,
            0.0,
        )
        frac = jnp.clip(frac, -0.5, 0.5)
    return peak, lag_best.astype(win.dtype) + frac


def exact_peak_refine_freq(
    ReCS: jnp.ndarray,       # (B, W, P, K) accurate cross-spectra (real)
    ImCS: jnp.ndarray,       # (B, W, P, K)
    tables: Dict[str, jnp.ndarray],
    k_idx: jnp.ndarray,      # (B, W, P) or (B, W, P, ncand) candidate lags
    lag_min: int,
    lag_half: jnp.ndarray,   # (B,) max |lag| per band
    refine: int = 1,
    subsample: bool = False,
    cand_valid: jnp.ndarray | None = None,  # (B, W, P, ncand) bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TPU-friendly exact peak re-evaluation in the frequency domain.

    Evaluates cc(l) = Re(CS) . Ec[:, l] - Im(CS) . Es[:, l] in float32 at
    each candidate lag and its ``refine`` neighbors by ROW-gathering the
    inverse DFT tables (an embedding-style lookup — contiguous (K,) rows —
    which the TPU handles well, unlike per-element gathers along the minor
    axis).  Re-argmaxes locally and returns (peak value, lag [samples,
    float]).  The result is f32-exact given f32-accurate cross-spectra, so
    the big inverse matmul can run in pure bf16.

    Multiple candidates (``k_idx`` with a trailing ncand axis, typically the
    top-2 peaks of the cheap search) make the selection robust to near-tied
    correlation peaks a cycle apart: the cheap search may rank two near-equal
    peaks either way depending on program shape/fusion, but as long as BOTH
    land in the candidate set, the exact re-evaluation picks the same winner
    in every program.  Exact value ties break toward the smaller lag (the
    reference's ascending-lag first-max convention, oracle._xcorr_delays).
    """
    EcT = tables["Ec"].T                           # (nlag, K)
    EsT = tables["Es"].T
    nlag = EcT.shape[0]
    if k_idx.ndim == ReCS.ndim - 1:
        k_idx = k_idx[..., None]
    ncand = k_idx.shape[-1]
    half = lag_half[:, None, None]
    k_lo = (-half) - lag_min
    k_hi = half - lag_min
    best = None
    for c in range(ncand):
        base = jnp.clip(k_idx[..., c], k_lo, k_hi)
        vals = []
        ks = []
        for off in range(-refine, refine + 1):
            k = jnp.clip(base + off, jnp.maximum(k_lo, 0),
                         jnp.minimum(k_hi, nlag - 1))
            ec = jnp.take(EcT, k, axis=0)          # (B, W, P, K)
            es = jnp.take(EsT, k, axis=0)
            vals.append(jnp.sum(ReCS * ec - ImCS * es, axis=-1))
            ks.append(k)
        stacked = jnp.stack(vals, axis=0)          # (2r+1, B, W, P)
        k_stack = jnp.stack(ks, axis=0)
        # within-group argmax with smaller-lag tie-break: clipping can
        # duplicate lags at the band edge, and near-ties must resolve
        # identically regardless of candidate order
        gmax = jnp.max(stacked, axis=0)
        kwin = jnp.min(jnp.where(stacked == gmax, k_stack, nlag), axis=0)
        sel = jnp.argmax(
            (k_stack == kwin[None]) & (stacked == gmax[None]), axis=0
        )
        peak = gmax
        k_sel = kwin
        frac = jnp.zeros_like(peak)
        if subsample:
            n = stacked.shape[0]
            km = jnp.clip(sel - 1, 0, n - 1)
            kp = jnp.clip(sel + 1, 0, n - 1)
            cm = jnp.take_along_axis(stacked, km[None], axis=0)[0]
            cp = jnp.take_along_axis(stacked, kp[None], axis=0)[0]
            denom = cm - 2.0 * peak + cp
            frac = jnp.where(
                (jnp.abs(denom) > 1e-20) & (sel > 0) & (sel < n - 1),
                0.5 * (cm - cp) / denom,
                0.0,
            )
            frac = jnp.clip(frac, -0.5, 0.5)
        if cand_valid is not None:
            peak = jnp.where(cand_valid[..., c], peak, -jnp.inf)
        if best is None:
            best = (peak, k_sel, frac)
        else:
            bpeak, bk, bfrac = best
            take = (peak > bpeak) | ((peak == bpeak) & (k_sel < bk))
            best = (
                jnp.where(take, peak, bpeak),
                jnp.where(take, k_sel, bk),
                jnp.where(take, frac, bfrac),
            )
    peak, k_sel, frac = best
    lag = k_sel.astype(ReCS.dtype) + lag_min + frac
    return peak, lag


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
    exact_peak: bool = False,
    lag_half: jnp.ndarray | None = None,   # (B,) max |lag|, for exact_peak
    refine: int = 1,
    supp_rad: jnp.ndarray | None = None,   # (B,) candidate-suppression radius
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MXU cross-correlation; same contract as `cross_correlate`.

    ``subsample=True`` refines each integer-lag peak with the parabolic
    vertex through its two neighbors (classic three-point interpolation) —
    a beyond-reference extension (the reference quantizes delays to the
    sample grid); off by default for parity.

    ``exact_peak=True`` re-evaluates the correlation exactly (float32,
    time domain) at the argmax lag and its ``refine`` neighbors and takes
    rho/tau from that local re-argmax — the fast-mode companion to a
    low-``precision`` (bf16) matmul search (see `exact_peak_refine`).

    ``supp_rad`` sets the per-band suppression radius for the second
    candidate of the exact re-evaluation.  A bandpassed correlation is
    oscillatory at the band's center period, and the cycle-skip failure of
    a cheap peak search is landing on the rival lobe ONE PERIOD away; with
    the default radius (= ``refine``) the second candidate is merely a
    neighboring lag of the same lobe and cannot catch that.  Passing
    ``supp_rad ~ half the band period in samples`` makes the second
    candidate the strongest *rival lobe*, so the exact f32 re-evaluation
    chooses between the true contenders (the fast-mode low-BT guard).
    """
    B, W, C, Lmax = win.shape
    energy = jnp.sum(win * win, axis=-1)

    # fast mode (exact_peak): the SMALL spectra matmul stays accurate (HIGH,
    # bf16x3) so the cross-spectra are ~f32; only the big inverse-DFT matmul
    # runs at the cheap precision, and the peak is re-evaluated exactly from
    # the accurate cross-spectra afterwards.
    spec_precision = jax.lax.Precision.HIGH if exact_peak else precision
    mm = lambda a, b, p: jnp.dot(a, b, precision=p,
                                 preferred_element_type=jnp.float32)
    flat = win.reshape(B * W * C, Lmax)
    ReF = mm(flat, tables["Cf"], spec_precision).reshape(B, W, C, -1)
    ImF = (-mm(flat, tables["Sf"], spec_precision)).reshape(B, W, C, -1)

    ReI, ImI = ReF[:, :, pairs[:, 0], :], ImF[:, :, pairs[:, 0], :]
    ReJ, ImJ = ReF[:, :, pairs[:, 1], :], ImF[:, :, pairs[:, 1], :]
    ReCS = ReJ * ReI + ImJ * ImI                     # F_j * conj(F_i)
    ImCS = ImJ * ReI - ReJ * ImI

    K = ReCS.shape[-1]
    P = pairs.shape[0]
    cc_lin = (
        mm(ReCS.reshape(-1, K), tables["Ec"], precision)
        - mm(ImCS.reshape(-1, K), tables["Es"], precision)
    ).reshape(B, W, P, -1)                           # (B, W, P, nlag)

    mask = lag_mask[:, None, None, :]
    cc_masked = jnp.where(mask, cc_lin, -jnp.inf)
    k_idx = jnp.argmax(cc_masked, axis=-1)
    peak = jnp.max(cc_masked, axis=-1)
    lag_min = tables.get("lag_min", -(Lmax - 1))
    if exact_peak:
        if lag_half is None:
            lag_half = jnp.full((B,), Lmax - 1, jnp.int32)
        # Top-2 candidates: suppress +-refine around the winner and re-argmax.
        # The cheap (low-precision / fusion-dependent) search may rank two
        # near-tied peaks a cycle apart either way; carrying both into the
        # exact re-evaluation makes the final lag choice program-shape
        # independent (merged multi-array == single-array parity).
        nlag_m = cc_masked.shape[-1]
        ar = jnp.arange(nlag_m, dtype=k_idx.dtype)
        rad = (refine if supp_rad is None
               else supp_rad[:, None, None, None].astype(k_idx.dtype))
        supp = jnp.abs(ar - k_idx[..., None]) <= rad
        cc2 = jnp.where(supp, -jnp.inf, cc_masked)
        k2 = jnp.argmax(cc2, axis=-1)
        valid2 = jnp.isfinite(jnp.max(cc2, axis=-1))
        k_cands = jnp.stack([k_idx, k2], axis=-1)
        cand_valid = jnp.stack(
            [jnp.ones_like(valid2), valid2], axis=-1
        )
        peak, lag = exact_peak_refine_freq(
            ReCS, ImCS, tables, k_cands, lag_min, lag_half,
            refine=refine, subsample=subsample, cand_valid=cand_valid,
        )
        tau = lag / fs
        Ei = energy[:, :, pairs[:, 0]]
        Ej = energy[:, :, pairs[:, 1]]
        denom = jnp.sqrt(Ei * Ej)
        rho = jnp.where(denom > 0, peak / denom, 0.0)
        mdccm = jnp.median(rho, axis=-1)
        return tau, rho, mdccm
    frac = 0.0
    if subsample:
        nlag = cc_lin.shape[-1]
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
