"""Pallas TPU megakernel: window extract -> spectra -> cross-spectra ->
inverse DFT -> masked peak, entirely in VMEM.

The SURVEY §7.1 "kernels/" blueprint, round-3 build.  The staged MXU path
(ops.xcorr.cross_correlate_mxu) materializes, per step, the window tensor
(B, W, C, L) ~24 MB, the spectra (B, W, C, K) ~48 MB, the cross-spectra
(B, W, P, K) ~336 MB and the correlation (B, W, P, nlag) ~168 MB in HBM
(canonical workload; chunking caps residency but not traffic).  This kernel
keeps ALL of them on-chip:

    grid = (bands_in_bucket, window_tiles, k_tiles)   # k innermost
    per (g, wt):
      kt == 0: slice Wt windows from the band's full-T row (VMEM-resident,
               ~768 KB), demean, store to scratch; compute per-channel
               energies
      every kt: spectra tile  F = win @ [Cf|Sf]_kt          (MXU)
                cross-spectra via static one-hot pair selections (MXU)
                cc += Re(CS) @ Ec_kt - Im(CS) @ Es_kt       (MXU)
      kt == nk-1: masked argmax over the VMEM-resident (Wt*P, nlag) cc,
               rho = peak / sqrt(Ei*Ej); emit (rho, lag index)

HBM traffic per band: the (C, T) row once, the four DFT tables once per
window tile, and the tiny (W, P) outputs — everything else never leaves
the chip.

Numerics: same circular-correlation identity and first-max tie-break as
`cross_correlate_mxu`; float32 accumulation (`preferred_element_type`),
matmul precision configurable.  Window demean/energy sums reduce in a
different order than the XLA path, so results can differ by float
rounding — the kernel is an opt-in xcorr_method, benchmarked against the
staged path (reference semantics per SURVEY §3.4: lts_array ltsva contract,
narrow_band_least_squares.py:91).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_kernel(
    # inputs
    hop_ref,      # (Bg, 1) SMEM  int32 per-band hop [samples]
    lob_ref,      # (Bg, 1) SMEM  int32 first valid lag index per band
    hib_ref,      # (Bg, 1) SMEM  int32 last valid lag index per band
    y_ref,        # (1, C, T) VMEM  band row (full segment)
    lenmask_ref,  # (1, Lg) VMEM   per-band valid-sample mask
    cf_ref,       # (Lg, Kt) VMEM  cos table k-tile
    sf_ref,       # (Lg, Kt) VMEM  sin table k-tile
    ec_ref,       # (Kt, nlagp) VMEM  inverse cos k-tile
    es_ref,       # (Kt, nlagp) VMEM  inverse sin k-tile
    si_ref,       # (P, C) VMEM   one-hot pair-i selection
    sj_ref,       # (P, C) VMEM   one-hot pair-j selection
    # outputs
    rho_ref,      # (1, Wt, P) VMEM
    idx_ref,      # (1, Wt, P) VMEM int32
    # scratch
    win_ref,      # (Wt*C, Lg) VMEM
    eng_ref,      # (Wt, C) VMEM
    cc_ref,       # (Wt*P, nlagp) VMEM f32 accumulator
    *,
    Wt: int, C: int, Lg: int, T: int, P: int, nlag: int, precision,
):
    g = pl.program_id(0)
    wt = pl.program_id(1)
    kt = pl.program_id(2)
    nk = pl.num_programs(2)
    hop = hop_ref[g, 0]

    @pl.when(kt == 0)
    def _extract():
        lm = lenmask_ref[0, :]                             # (Lg,)
        length = jnp.sum(lm)
        for w in range(Wt):
            start = (wt * Wt + w) * hop
            start = jnp.minimum(start, T - Lg)
            raw = y_ref[0, :, pl.ds(start, Lg)]            # (C, Lg)
            raw = raw * lm[None, :]
            mean = jnp.sum(raw, axis=1, keepdims=True) / length
            win = (raw - mean) * lm[None, :]
            win_ref[w * C:(w + 1) * C, :] = win
            eng_ref[w, :] = jnp.sum(win * win, axis=1)

    # ---- spectra k-tile (MXU) ----
    win = win_ref[:]                                       # (Wt*C, Lg)
    ReF = jnp.dot(win, cf_ref[:], precision=precision,
                  preferred_element_type=jnp.float32)      # (Wt*C, Kt)
    ImF = -jnp.dot(win, sf_ref[:], precision=precision,
                   preferred_element_type=jnp.float32)

    # ---- pair selection via one-hot matmuls (MXU, tiny) ----
    Kt = ReF.shape[1]
    ReFw = ReF.reshape(Wt, C, Kt)
    ImFw = ImF.reshape(Wt, C, Kt)

    def sel(S, X):
        # (P, C) @ (Wt, C, Kt) -> (Wt, P, Kt)
        return jax.lax.dot_general(
            X, S[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).transpose(0, 2, 1)

    ReI, ImI = sel(si_ref, ReFw), sel(si_ref, ImFw)
    ReJ, ImJ = sel(sj_ref, ReFw), sel(sj_ref, ImFw)
    ReCS = (ReJ * ReI + ImJ * ImI).reshape(Wt * P, Kt)
    ImCS = (ImJ * ReI - ReJ * ImI).reshape(Wt * P, Kt)

    # ---- inverse-DFT accumulation (MXU) ----
    part = (
        jnp.dot(ReCS, ec_ref[:], precision=precision,
                preferred_element_type=jnp.float32)
        - jnp.dot(ImCS, es_ref[:], precision=precision,
                  preferred_element_type=jnp.float32)
    )                                                      # (Wt*P, nlagp)

    @pl.when(kt == 0)
    def _init():
        cc_ref[:] = part

    @pl.when(kt > 0)
    def _acc():
        cc_ref[:] = cc_ref[:] + part

    # ---- masked peak + rho at the last k-tile ----
    @pl.when(kt == nk - 1)
    def _peak():
        cc = cc_ref[:]                                     # (Wt*P, nlagp)
        col = jax.lax.broadcasted_iota(jnp.int32, cc.shape, 1)
        valid = (col >= lob_ref[g, 0]) & (col <= hib_ref[g, 0])
        ccm = jnp.where(valid, cc, -jnp.inf)
        k_best = jnp.argmax(ccm, axis=1).astype(jnp.int32)  # first max
        peak = jnp.max(ccm, axis=1)
        eng = eng_ref[:]                                   # (Wt, C)
        Ei = jax.lax.dot_general(
            eng, si_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (Wt, P)
        Ej = jax.lax.dot_general(
            eng, sj_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        denom = jnp.sqrt(Ei * Ej).reshape(Wt * P)
        rho = jnp.where(denom > 0, peak / denom, 0.0)
        rho_ref[0] = rho.reshape(Wt, P)
        idx_ref[0] = k_best.reshape(Wt, P)


@functools.partial(
    jax.jit,
    static_argnames=("Wmax", "T", "Wt", "Kt", "interpret", "precision"),
)
def fused_xcorr_bucket(
    y: jnp.ndarray,          # (Bg, C, T) filtered band rows
    hop: jnp.ndarray,        # (Bg, 1) int32
    lo: jnp.ndarray,         # (Bg, 1) int32 first valid lag index
    hi: jnp.ndarray,         # (Bg, 1) int32 last valid lag index
    len_mask: jnp.ndarray,   # (Bg, Lg)
    cf: jnp.ndarray,         # (Lg, Kp)
    sf: jnp.ndarray,         # (Lg, Kp)
    ec: jnp.ndarray,         # (Kp, nlagp)
    es: jnp.ndarray,         # (Kp, nlagp)
    si: jnp.ndarray,         # (P, C) one-hot
    sj: jnp.ndarray,         # (P, C)
    Wmax: int,
    T: int,
    Wt: int = 16,
    Kt: int = 128,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGH,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the fused kernel over one window-length bucket.

    Returns (rho (Bg, Wp, P), idx (Bg, Wp, P) int32) with Wp >= Wmax
    (rounded up to the window tile); callers slice [:, :Wmax].
    """
    Bg, C, _ = y.shape
    Lg = len_mask.shape[1]
    P = si.shape[0]
    Kp = cf.shape[1]
    nlagp = ec.shape[1]
    Wp = _round_up(Wmax, Wt)
    nk = Kp // Kt

    grid = (Bg, Wp // Wt, nk)
    kernel = functools.partial(
        _fused_kernel, Wt=Wt, C=C, Lg=Lg, T=T, P=P, nlag=nlagp,
        precision=precision,
    )
    rho, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # hop
            pl.BlockSpec(memory_space=pltpu.SMEM),             # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),             # hi
            pl.BlockSpec((1, C, T), lambda g, w, k: (g, 0, 0)),
            pl.BlockSpec((1, Lg), lambda g, w, k: (g, 0)),
            pl.BlockSpec((Lg, Kt), lambda g, w, k: (0, k)),
            pl.BlockSpec((Lg, Kt), lambda g, w, k: (0, k)),
            pl.BlockSpec((Kt, nlagp), lambda g, w, k: (k, 0)),
            pl.BlockSpec((Kt, nlagp), lambda g, w, k: (k, 0)),
            pl.BlockSpec((P, C), lambda g, w, k: (0, 0)),
            pl.BlockSpec((P, C), lambda g, w, k: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Wt, P), lambda g, w, k: (g, w, 0)),
            pl.BlockSpec((1, Wt, P), lambda g, w, k: (g, w, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bg, Wp, P), jnp.float32),
            jax.ShapeDtypeStruct((Bg, Wp, P), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Wt * C, Lg), jnp.float32),
            pltpu.VMEM((Wt, C), jnp.float32),
            pltpu.VMEM((Wt * P, nlagp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bg * Wp * (C * Lg * 2 * Kp + P * Kp * 2 * nlagp) // 1,
            bytes_accessed=4 * (
                Bg * C * T
                + (Wp // Wt) * Bg * (2 * Lg * Kp + 2 * Kp * nlagp)
                + 2 * Bg * Wp * P
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(hop, lo, hi, y, len_mask, cf, sf, ec, es, si, sj)
    return rho, idx


def precompute_fused_tables(
    Lg: int,
    pairs: np.ndarray,       # (P, 2) int
    nchans: int,
    dtype=np.float32,
    max_lag: int | None = None,
    Kt: int = 128,
) -> Dict[str, np.ndarray]:
    """Host-side tables for `fused_xcorr_bucket` (one bucket, length Lg).

    Same DFT construction as ops.xcorr.precompute_dft_tables (nfft = 2*Lg,
    lags [-half, half]); K and nlag are zero-padded to tile multiples
    (extra k columns are zero in both forward and inverse tables, so they
    contribute nothing; extra lag columns are masked by [lo, hi]).
    """
    from narrow_band_least_squares_tpu.ops.xcorr import precompute_dft_tables

    tab = precompute_dft_tables(Lg, dtype=dtype, max_lag=max_lag)
    Cf, Sf, Ec, Es = tab["Cf"], tab["Sf"], tab["Ec"], tab["Es"]
    K = Cf.shape[1]
    nlag = Ec.shape[1]
    Kp = _round_up(K, Kt)
    nlagp = _round_up(nlag, 128)
    Cf = np.pad(Cf, ((0, 0), (0, Kp - K)))
    Sf = np.pad(Sf, ((0, 0), (0, Kp - K)))
    Ec = np.pad(Ec, ((0, Kp - K), (0, nlagp - nlag)))
    Es = np.pad(Es, ((0, Kp - K), (0, nlagp - nlag)))
    P = len(pairs)
    si = np.zeros((P, nchans), dtype=dtype)
    sj = np.zeros((P, nchans), dtype=dtype)
    for p, (i, j) in enumerate(pairs):
        si[p, int(i)] = 1.0
        sj[p, int(j)] = 1.0
    return {
        "Cf": Cf.astype(dtype), "Sf": Sf.astype(dtype),
        "Ec": Ec.astype(dtype), "Es": Es.astype(dtype),
        "si": si, "sj": sj,
        "lag_min": tab["lag_min"], "nlag": nlag, "K": K,
    }
