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
      kt == 0: slice Wt windows from the band's full-T row (VMEM-resident;
               lane-aligned slab load + pltpu.roll for the sub-128 offset),
               demean, store to scratch; per-(window, channel) energies
      every kt: spectra tile  F = win @ [Cf|Sf]_kt          (MXU)
                pair rows via block-diagonal one-hot matmuls (MXU)
                cc += Re(CS) @ Ec_kt - Im(CS) @ Es_kt       (MXU)
      kt == nk-1: masked argmax over the VMEM-resident (Wt*P, nlag) cc,
               rho = peak / sqrt(Ei*Ej); emit (rho, lag index)

Mosaic constraints shape the implementation: every tensor op is 2-D (the
pair selection is ``kron(I_Wt, onehot)`` matmuls, not 3-D dot_generals),
vectors ride as (N, 1) columns, lane-dim dynamic slices load 128-aligned
slabs rotated into place, and matmul precision HIGH is emulated as the
standard bf16x3 split product (`_kdot`).

HBM traffic per band: the (C, T) row once, the four DFT tables once per
window tile, and the tiny (W, P) outputs — everything else never leaves
the chip.

Numerics: same circular-correlation identity and first-max tie-break as
`cross_correlate_mxu`; float32 accumulation; window demean/energy sums
reduce in a different order than the XLA path, so results can differ by
float rounding — the kernel is an opt-in xcorr_method, benchmarked against
the staged path (reference semantics per SURVEY §3.4: lts_array ltsva
contract, narrow_band_least_squares.py:91).
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


def _kdot(a: jnp.ndarray, b: jnp.ndarray, precision) -> jnp.ndarray:
    """Matmul with XLA-equivalent precision semantics inside Mosaic.

    Mosaic only lowers DEFAULT/HIGHEST dot precisions; HIGH (bf16x3, the
    staged path's default) is emulated with the standard split-product:
    a = ah + al, b = bh + bl (bf16 high parts), ab ~= ah*bh + ah*bl + al*bh.
    """
    if precision == jax.lax.Precision.HIGHEST:
        return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    if precision == jax.lax.Precision.DEFAULT:
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _fused_kernel(
    # inputs
    hop_ref,      # (Bg, 1) SMEM  int32 per-band hop [samples]
    maxst_ref,    # (Bg, 1) SMEM  int32 last valid window start (T - Lb)
    lob_ref,      # (Bg, 1) SMEM  int32 first valid lag index per band
    hib_ref,      # (Bg, 1) SMEM  int32 last valid lag index per band
    y_ref,        # (1, C, Tp) VMEM  band row (T + slab padding)
    lenmask_ref,  # (1, 1, Lg) VMEM   per-band valid-sample mask
    cf_ref,       # (Lg, Kt) VMEM  cos table k-tile
    sf_ref,       # (Lg, Kt) VMEM  sin table k-tile
    ec_ref,       # (Kt, nlagp) VMEM  inverse cos k-tile
    es_ref,       # (Kt, nlagp) VMEM  inverse sin k-tile
    sbi_ref,      # (Wt*P, Wt*C) VMEM  block-diag one-hot pair-i selection
    sbj_ref,      # (Wt*P, Wt*C) VMEM  block-diag one-hot pair-j selection
    # outputs
    rho_ref,      # (1, Wt*P, 1) VMEM
    idx_ref,      # (1, Wt*P, 1) VMEM int32
    # scratch
    win_ref,      # (Wt*C, Lg) VMEM
    eng_ref,      # (Wt*C, 1) VMEM
    cc_ref,       # (Wt*P, nlagp) VMEM f32 accumulator
    *,
    Wt: int, C: int, Lg: int, T: int, Lslab: int, P: int, precision,
):
    g = pl.program_id(0)
    wt = pl.program_id(1)
    kt = pl.program_id(2)
    nk = pl.num_programs(2)
    hop = hop_ref[g, 0]

    @pl.when(kt == 0)
    def _extract():
        lm = lenmask_ref[0, 0, :]                          # (Lg,)
        length = jnp.sum(lm)
        ones = jnp.ones((Lg, 1), jnp.float32)
        for w in range(Wt):
            start = (wt * Wt + w) * hop
            # clamp PADDED window slots to the band's true last valid
            # start (T - Lb, via SMEM); clamping to the bucket-padded
            # T - Lg would shift a mixed-length bucket's last real
            # windows earlier and corrupt their tau/rho
            start = jnp.minimum(start, maxst_ref[g, 0])
            # lane-dim dynamic slices must be 128-aligned: load an aligned
            # slab and rotate the sub-128 remainder into place
            base = pl.multiple_of((start // 128) * 128, 128)
            slab = y_ref[0, :, pl.ds(base, Lslab)]         # (C, Lslab)
            raw = pltpu.roll(slab, -(start - base), axis=1)[:, :Lg]
            raw = raw * lm[None, :]
            mean = jnp.sum(raw, axis=1, keepdims=True) / length
            win = (raw - mean) * lm[None, :]
            win_ref[w * C:(w + 1) * C, :] = win
            eng_ref[w * C:(w + 1) * C, :] = jnp.dot(
                win * win, ones,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

    # ---- spectra k-tile (MXU) ----
    win = win_ref[:]                                       # (Wt*C, Lg)
    ReF = _kdot(win, cf_ref[:], precision)                 # (Wt*C, Kt)
    ImF = -_kdot(win, sf_ref[:], precision)

    # ---- pair rows via block-diagonal one-hot matmuls (MXU, exact) ----
    def sel(S_ref, X):
        return jnp.dot(
            S_ref[:], X,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                                  # (Wt*P, Kt)

    ReI, ImI = sel(sbi_ref, ReF), sel(sbi_ref, ImF)
    ReJ, ImJ = sel(sbj_ref, ReF), sel(sbj_ref, ImF)
    ReCS = ReJ * ReI + ImJ * ImI
    ImCS = ImJ * ReI - ReJ * ImI

    # ---- inverse-DFT accumulation (MXU) ----
    # lag-chunked so the pre-accumulation temporary stays ~1 MB instead of
    # a second full (Wt*P, nlagp) buffer (VMEM budget)
    nlagp = cc_ref.shape[1]
    CHUNK = 640
    for c0 in range(0, nlagp, CHUNK):
        c1 = min(c0 + CHUNK, nlagp)
        part = (
            _kdot(ReCS, ec_ref[:, c0:c1], precision)
            - _kdot(ImCS, es_ref[:, c0:c1], precision)
        )                                                  # (Wt*P, chunk)

        @pl.when(kt == 0)
        def _init():
            cc_ref[:, c0:c1] = part

        @pl.when(kt > 0)
        def _acc():
            cc_ref[:, c0:c1] = cc_ref[:, c0:c1] + part

    # ---- masked peak + rho at the last k-tile ----
    @pl.when(kt == nk - 1)
    def _peak():
        cc = cc_ref[:]                                     # (Wt*P, nlagp)
        col = jax.lax.broadcasted_iota(jnp.int32, cc.shape, 1)
        valid = (col >= lob_ref[g, 0]) & (col <= hib_ref[g, 0])
        ccm = jnp.where(valid, cc, -jnp.inf)
        peak = jnp.max(ccm, axis=1, keepdims=True)         # (Wt*P, 1)
        k_best = jnp.argmax(ccm, axis=1, keepdims=True).astype(jnp.int32)
        Ei = jnp.dot(sbi_ref[:], eng_ref[:],
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)   # (Wt*P, 1)
        Ej = jnp.dot(sbj_ref[:], eng_ref[:],
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
        denom = jnp.sqrt(Ei * Ej)
        rho = jnp.where(denom > 0, peak / denom, 0.0)
        rho_ref[0] = rho
        idx_ref[0] = k_best


@functools.partial(
    jax.jit,
    static_argnames=("Wmax", "T", "Wt", "Kt", "interpret", "precision"),
)
def fused_xcorr_bucket(
    y: jnp.ndarray,          # (Bg, C, T) filtered band rows
    hop: jnp.ndarray,        # (Bg, 1) int32
    maxstart: jnp.ndarray,   # (Bg, 1) int32 last valid window start
    lo: jnp.ndarray,         # (Bg, 1) int32 first valid lag index
    hi: jnp.ndarray,         # (Bg, 1) int32 last valid lag index
    len_mask: jnp.ndarray,   # (Bg, Lg)
    cf: jnp.ndarray,         # (Lg, Kp)
    sf: jnp.ndarray,         # (Lg, Kp)
    ec: jnp.ndarray,         # (Kp, nlagp)
    es: jnp.ndarray,         # (Kp, nlagp)
    sbi: jnp.ndarray,        # (Wt*P, Wt*C) block-diag one-hot
    sbj: jnp.ndarray,        # (Wt*P, Wt*C)
    Wmax: int,
    T: int,
    Wt: int = 8,
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
    len_mask = len_mask.reshape(Bg, 1, Lg)
    P = sbi.shape[0] // Wt
    Kp = cf.shape[1]
    nlagp = ec.shape[1]
    Wp = _round_up(Wmax, Wt)
    nk = Kp // Kt

    # slab = aligned load window for the in-kernel extraction (see kernel)
    Lslab = _round_up(Lg, 128) + 128
    Tp = _round_up(T + Lslab, 128)
    y = jnp.pad(y, ((0, 0), (0, 0), (0, Tp - y.shape[2])))

    grid = (Bg, Wp // Wt, nk)
    kernel = functools.partial(
        _fused_kernel, Wt=Wt, C=C, Lg=Lg, T=T, Lslab=Lslab, P=P,
        precision=precision,
    )
    rho, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # hop
            pl.BlockSpec(memory_space=pltpu.SMEM),             # maxstart
            pl.BlockSpec(memory_space=pltpu.SMEM),             # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),             # hi
            pl.BlockSpec((1, C, Tp), lambda g, w, k: (g, 0, 0)),
            pl.BlockSpec((1, 1, Lg), lambda g, w, k: (g, 0, 0)),
            pl.BlockSpec((Lg, Kt), lambda g, w, k: (0, k)),
            pl.BlockSpec((Lg, Kt), lambda g, w, k: (0, k)),
            pl.BlockSpec((Kt, nlagp), lambda g, w, k: (k, 0)),
            pl.BlockSpec((Kt, nlagp), lambda g, w, k: (k, 0)),
            pl.BlockSpec((Wt * P, Wt * C), lambda g, w, k: (0, 0)),
            pl.BlockSpec((Wt * P, Wt * C), lambda g, w, k: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Wt * P, 1), lambda g, w, k: (g, w, 0)),
            pl.BlockSpec((1, Wt * P, 1), lambda g, w, k: (g, w, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bg, Wp * P, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bg, Wp * P, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Wt * C, Lg), jnp.float32),
            pltpu.VMEM((Wt * C, 1), jnp.float32),
            pltpu.VMEM((Wt * P, nlagp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bg * Wp * (C * Lg * 2 * Kp + P * Kp * 2 * nlagp),
            bytes_accessed=4 * (
                Bg * C * Tp
                + (Wp // Wt) * Bg * (2 * Lg * Kp + 2 * Kp * nlagp)
                + 2 * Bg * Wp * P
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(hop, maxstart, lo, hi, y, len_mask, cf, sf, ec, es, sbi, sbj)
    rho = rho.reshape(Bg, Wp, P)
    idx = idx.reshape(Bg, Wp, P)
    return rho, idx


def precompute_fused_tables(
    Lg: int,
    pairs: np.ndarray,       # (P, 2) int
    nchans: int,
    dtype=np.float32,
    max_lag: int | None = None,
    Kt: int = 128,
    Wt: int = 8,
) -> Dict[str, np.ndarray]:
    """Host-side tables for `fused_xcorr_bucket` (one bucket, length Lg).

    Same DFT construction as ops.xcorr.precompute_dft_tables (nfft = 2*Lg,
    lags [-half, half]); K and nlag are zero-padded to tile multiples
    (extra k columns are zero in both forward and inverse tables, so they
    contribute nothing; extra lag columns are masked by [lo, hi]).  The
    pair selections ship as ``kron(I_Wt, onehot)`` block-diagonal matrices
    so the kernel's selection stays a plain 2-D matmul.
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
    eye = np.eye(Wt, dtype=dtype)
    return {
        "Cf": Cf.astype(dtype), "Sf": Sf.astype(dtype),
        "Ec": Ec.astype(dtype), "Es": Es.astype(dtype),
        "sbi": np.kron(eye, si), "sbj": np.kron(eye, sj),
        "lag_min": tab["lag_min"], "nlag": nlag, "K": K, "Wt": Wt,
    }
