"""The flagship model: the whole narrow-band run as one jitted device step.

Replaces the reference's per-band Python loop (sequential orchestrator at
``narrow_band_least_squares.py:67-124``) and its joblib process fan-out
(``:285``) with a single XLA computation over the dense
``(band, window, pair)`` grid:

    raw (C, T) --rfft--> filter bank (B, C, T) --gather--> (B, W, C, L)
      --rfft/irfft--> delays+MdCCM (B, W, P) --2x2 solve / LTS sweep-->
      vel/baz/sigma_tau/flags (B, W)

Everything is statically shaped; ragged per-band window counts live in masks
(the reference's own dense-prefix + num_compute_list contract, SURVEY §3.2).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from narrow_band_least_squares_tpu.io.stream import ArrayStream
from narrow_band_least_squares_tpu.ops import filters as F
from narrow_band_least_squares_tpu.ops import lts as LTS
from narrow_band_least_squares_tpu.ops import solve as SOLVE
from narrow_band_least_squares_tpu.ops import xcorr as XC
from narrow_band_least_squares_tpu.ops.windows import (
    build_window_grid,
    extract_windows,
    extract_windows_patches,
    extract_windows_strided,
    extract_windows_strided_bucket,
)
from narrow_band_least_squares_tpu.utils.geometry import coarray
from narrow_band_least_squares_tpu.utils.plan import NarrowBandPlan
from narrow_band_least_squares_tpu.utils.timeutils import (
    epoch_to_datenum,
    stdict_timestamp_key,
)

logger = logging.getLogger("nbls_tpu")


@dataclass
class NarrowBandResult:
    """Dense results with the reference's pad-and-mask output contract."""

    vel_array: np.ndarray        # (B, width)
    baz_array: np.ndarray
    mdccm_array: np.ndarray
    t_array: np.ndarray          # matplotlib datenums
    sig_tau_array: np.ndarray
    vel_uncert_array: np.ndarray
    baz_uncert_array: np.ndarray
    num_compute_list: List[int]
    flags: Optional[np.ndarray]  # (B, Wmax, P) bool, LTS only
    pairs: np.ndarray            # (P, 2)
    nchans: int
    plan: NarrowBandPlan
    w_array: Optional[np.ndarray] = None  # (B, F) complex, filter response
    h_array: Optional[np.ndarray] = None

    def stdict(self, band_prefix: bool = True):
        """Materialize the reference's LTS flag dictionary (None for OLS)."""
        if self.flags is None:
            return None
        return flags_to_stdict(
            self.flags, self.t_array, self.num_compute_list, self.pairs,
            self.nchans, band_prefix=band_prefix,
        )


def band_limit_auto_db(bt_min: float) -> float:
    """BT-aware band-limit threshold (band_limit_db='auto').

    A cheap peak search cycle-skips when the correlation envelope is
    flat: neighboring lobes differ by ~1/(2BT), so the tolerable cc
    error — and hence the bin-truncation level — must scale with the
    band's time-bandwidth product.  Calibrated on a controlled BT sweep
    (benchmarks/bench_bt_sweep.py, BENCH_BANDLIMIT.json bt_sweep:
    minimum threshold keeping confident-window lag identity >= 99% at
    BT in {1.5, 2, 2.5, 3, 3.5, 5} = {70, 50, 50, 50, 40, 40} dB):
    ``db = 40 + 95*log10(4.6/BT)``, clipped to [40, 90], dominates every
    measured requirement by >= 5 dB.  Residual deviations at the auto
    threshold are single-lag flips (vel maxdev ~1e-4 km/s); true cycle
    skips (>0.01 km/s) appear only at BT <= 1.5 below 60 dB, well under
    the curve.  (Rounds <= 4 used a two-point fit, 40 + 85*log10(3.8/BT),
    which under-shot the measured 50 dB requirement at BT = 3.)
    """
    import math

    if bt_min >= 4.6:
        return 40.0
    return float(min(90.0, 40.0 + 95.0 * math.log10(4.6 / max(bt_min, 0.05))))


def flags_to_stdict(
    flags: np.ndarray,           # (B, Wmax, P) bool
    t_array: np.ndarray,         # (B, width) datenums
    num_compute_list: Sequence[int],
    pairs: np.ndarray,           # (P, 2) 0-based
    nchans: int,
    band_prefix: bool = True,
) -> Dict[str, object]:
    """Dense flag tensor -> the reference's string-keyed stdict.

    Keys are 7-decimal stringified window datenums, values 1-based element
    numbers (one entry per flagged pair touching the element), one 'size'
    key, and — when band_prefix — keys prefixed "NN_" by 1-based band number
    (contract: reference ``narrow_band_least_squares.py:114-124``,
    ``plotting.py:896-941``).
    """
    out: Dict[str, object] = {}
    B = flags.shape[0]
    for b in range(B):
        for w in range(int(num_compute_list[b])):
            flagged = np.where(flags[b, w])[0]
            elements: List[int] = []
            for p in flagged:
                i, j = pairs[p]
                elements.extend([int(i) + 1, int(j) + 1])
            key = stdict_timestamp_key(t_array[b, w])
            if band_prefix:
                key = str(b + 1).zfill(2) + "_" + key
            out[key] = np.asarray(elements, dtype=np.int64)
    out["size"] = int(nchans)
    return out


class NarrowBandPipeline:
    """Compiled narrow-band (or broadband) least-squares pipeline.

    Host-side construction designs the filter bank and window grid once;
    `run` executes the jitted step on device and re-packs results into the
    reference's dense-output contract.

    Args:
        plan: static band/window plan (utils.plan.make_plan).
        rij: (2, N) element coordinates [km].
        filter_type/filter_order/filter_ripple: reference filter knobs.
        alpha: 1.0 -> OLS, [0.5, 1) -> LTS.
        apply_filter: False to consume pre-filtered data (the `ltsva`
            call contract, where the caller has already run filter_data).
        dtype: device compute dtype.
    """

    def __init__(
        self,
        plan: NarrowBandPlan,
        rij: np.ndarray,
        filter_type: str = "cheby1",
        filter_order: int = 2,
        filter_ripple: float = 0.01,
        alpha: float = 1.0,
        apply_filter: bool = True,
        dtype=jnp.float32,
        c_steps: int = 4,
        taper_percentage: float = 0.01,
        max_lts_candidates: int = 0,   # 0 = all C(P,2); >0 subsamples
        xcorr_method: str = "mxu",   # 'mxu' (DFT-as-matmul) | 'fft' |
        #   'pallas' (fused icorr+argmax) | 'fused' (pallas megakernel:
        #   extract+spectra+xcorr+argmax all VMEM-resident, SURVEY §7.1)
        window_method: str = "strided",  # 'strided' (reshape-based; v5e: 1.2 ms
        #   vs 5.9 ms gather on the canonical extract) | 'gather' | 'patches'
        max_lag_s: float = None,  # cap the lag search to +-max_lag_s seconds
        matmul_precision: str = "high",  # 'highest'|'high'(bf16x3, ~f32-acc)|'default'
        lts_candidate_chunk: int = 0,    # >0: bound LTS memory for large arrays
        lts_funnel_k: int = 0,           # >0: FAST-LTS funnel (top-K
        #   survivors after one C-step on all candidates); 'auto' picks
        #   max(16, ceil(Q/24)) — measured on canonical8/dense50/lowbt
        #   (P=28) and clean P=66/P=120 arrays: k=16 already reproduces
        #   exhaustive LTS exactly on every CONFIDENT (mdccm>0.6) window
        #   (worst conf-window vel dev 2.9e-4 km/s, dense50; deviations
        #   beyond that exist only on non-confident windows whose LTS
        #   objective is flat), and the Q/24 scaling keeps proportional
        #   headroom for larger co-arrays (BENCH_LTS_FUNNEL.json).
        subsample_delays: bool = False,  # parabolic sub-sample lag refinement
        bucket_bands: bool = True,       # compact per-winlen-bucket xcorr grids
        bucket_ratio: float = 1.3,       # (legacy knob; grouping is cost-based)
        bucket_slack: float = 1.08,      # padded/true cost tolerance per bucket
        xcorr_chunk_mb: float = 16.0,    # cap the per-chunk cc tensor (0 = off)
        xcorr_lag_tile: int = 512,       # lag-axis tile of the inverse-DFT
        #   matmul; the running (max, argmax) across tiles keeps the
        #   (B, W, P, nlag) cc tensor out of HBM (0 = full materialization).
        #   Bit-identical tau/rho (ops.xcorr.cross_correlate_mxu).
        band_limit_db: float = 0.0,      # >0: restrict the xcorr DFT
        #   matmuls to bins where the band's filter response exceeds
        #   -band_limit_db dB (ops.xcorr.band_limit_bins).  Opt-in
        #   production mode; the dropped stopband bins bound the cc error
        #   at the filter's stopband level.  Measured guidance
        #   (BENCH_BANDLIMIT.json): -40 dB is safe for standard octave/
        #   log plans (BT >~ 4; 98.6% bit-identical lags, vel maxdev
        #   4e-4 km/s); very-low-BT dense sweeps cycle-skip at -40 and
        #   need -80 dB (98.2% identical, maxdev 0.006 km/s).
        #   "auto" applies a per-bucket BT-aware threshold (band_limit_auto_db)
        #   so one setting is safe on any plan.  Exact parity keeps all
        #   bins (the default).
    ):
        from narrow_band_least_squares_tpu.utils.compcache import (
            enable_compilation_cache,
        )
        enable_compilation_cache()

        self.plan = plan
        self.rij = np.asarray(rij, dtype=np.float64)
        self.alpha = float(alpha)
        self.apply_filter = apply_filter
        self.filter_type = filter_type
        self.filter_order = filter_order
        self.filter_ripple = filter_ripple
        self.dtype = dtype
        self.c_steps = c_steps
        self.lts_candidate_chunk = lts_candidate_chunk
        self.lts_funnel_k = (
            "auto" if lts_funnel_k == "auto" else int(lts_funnel_k)
        )
        self.subsample_delays = subsample_delays
        # XLA's fusion/tiling of the masked-argmax over the (B, W, P, nlag)
        # correlation tensor falls off a cliff once the tensor passes a few
        # hundred MB (measured on v5e: dense50 delays ran at 242 GB/s vs
        # 615 GB/s healthy; same cliff as the multi-array merge, see
        # models/multiarray.py).  Chunking the band axis so each xcorr
        # slice's cc tensor stays under `xcorr_chunk_mb` restores roofline
        # throughput; chunks are unrolled inside one jit, numerics
        # identical.  0 disables (the pre-fix single-program behavior).
        # v5e sweep (benchmarks/diag_dense50b.py): dense50 95.2 -> 26.3 ms
        # and canonical 6.13 -> 5.83 ms at 16 MB; 256 MB is already back on
        # the cliff.  Chunks are unrolled (not lax.map) so XLA can overlap
        # them; very dense sweeps (hundreds of bands) pay compile time.
        self.xcorr_chunk_bytes = int(float(xcorr_chunk_mb) * 1e6)
        self.xcorr_lag_tile = int(xcorr_lag_tile)
        self.band_limit_db = (
            "auto" if band_limit_db == "auto" else float(band_limit_db)
        )
        self.nchans = self.rij.shape[1]

        # ---- geometry / solver constants (host) ----
        X, pairs = coarray(self.rij)
        self.X64 = X
        self.pairs_np = pairs
        lsq = SOLVE.precompute_lstsq(X)
        self.XtX_inv64 = lsq["XtX_inv"]          # float64 host copy
        self._X = jnp.asarray(X, dtype)
        self._pinv = jnp.asarray(lsq["pinv"], dtype)
        self._XtX_inv = jnp.asarray(lsq["XtX_inv"], dtype)
        if self.alpha < 1.0:
            cinfo = LTS.precompute_candidates(X, max_candidates=max_lts_candidates)
            self._cand = jnp.asarray(cinfo["cand"])
            self._Ainv = jnp.asarray(cinfo["Ainv"], dtype)
            self._cand_ok = jnp.asarray(cinfo["ok"])
            self.h = LTS.lts_h(self.alpha, X.shape[0])
            if self.lts_funnel_k == "auto":
                self.lts_funnel_k = max(16, -(-len(cinfo["cand"]) // 24))
            # full enumeration is the default; for large arrays bound the
            # (B, W, Q, ...) sweep memory by chunking the candidate axis
            # (identical results) instead of dropping candidates
            if not self.lts_candidate_chunk and len(cinfo["cand"]) > 4096:
                self.lts_candidate_chunk = 4096
        elif self.lts_funnel_k == "auto":
            self.lts_funnel_k = 0      # OLS: no LTS sweep to funnel

        # ---- filter bank (host design) ----
        self.zerophase = filter_type == "butter"
        if apply_filter:
            edges = [plan.edges(b) for b in range(plan.nbands)]
            h_bank, sos_list, L = F.build_filter_bank(
                edges, filter_type, filter_order, filter_ripple,
                plan.fs, plan.npts,
            )
            self.sos_list = sos_list
            self._h_bank = jnp.asarray(h_bank, dtype)
            self.nfft_filter = F.next_pow2(plan.npts + L)
            for b, bt in enumerate(plan.bt_products()):
                if bt < 5.0:
                    lo, hi = plan.edges(b)
                    logger.warning(
                        "CAUTION: BT < 5! Band between %s Hz and %s Hz has BT = %s",
                        lo, hi, bt,
                    )
        else:
            self.sos_list = None
        self._taper = jnp.asarray(F.taper_window(plan.npts, taper_percentage), dtype)

        # ---- window grid (host) ----
        grid = build_window_grid(plan)
        self.grid = grid
        self._idx = jnp.asarray(grid.idx)
        self._win_mask = jnp.asarray(grid.win_mask)
        self._len_mask = jnp.asarray(grid.len_mask, dtype)
        self._lengths = jnp.asarray(grid.lengths, dtype)
        self._lag_mask = jnp.asarray(grid.lag_mask)
        self._pairs = jnp.asarray(pairs)
        self.nfft_corr = F.next_pow2(2 * grid.Lmax)
        self.window_method = window_method
        self.xcorr_method = xcorr_method
        self.max_lag_s = max_lag_s
        import jax.lax as _lax
        self.matmul_precision = {
            "highest": _lax.Precision.HIGHEST,
            "high": _lax.Precision.HIGH,
            "default": _lax.Precision.DEFAULT,
        }[matmul_precision]
        if xcorr_method in ("pallas", "fused"):
            if subsample_delays:
                logger.warning(
                    "subsample_delays is ignored with xcorr_method='pallas' "
                    "(the fused kernel returns integer-lag peaks); use "
                    "xcorr_method='mxu' for parabolic sub-sample refinement"
                )
        max_lag = None
        if max_lag_s is not None:
            max_lag = min(int(max_lag_s * plan.fs), grid.Lmax - 1)
            half = max_lag
            c = grid.Lmax - 1
            self._lag_mask = jnp.asarray(
                grid.lag_mask[:, c - half : c + half + 1]
            )
        half = grid.lengths.astype(np.int64) - 1
        if max_lag is not None:
            half = np.minimum(half, max_lag)
        self._lag_half = jnp.asarray(half, jnp.int32)
        # bucketing is numerically equivalent to the global grid and ~2x
        # faster (measured on v5e, both 8-band canonical and 50-band dense);
        # it composes with the gather/strided extractors and both the mxu
        # and pallas correlators.
        self.bucket_bands = (
            bool(bucket_bands)
            and xcorr_method in ("mxu", "pallas")
            and window_method in ("gather", "strided")
        ) or xcorr_method == "fused"   # the megakernel is per-bucket
        if xcorr_method in ("pallas", "fused"):
            # fall back to the interpreter off-TPU (tests on CPU)
            self._pallas_interpret = jax.default_backend() not in ("tpu", "axon")
        if xcorr_method == "fused":
            from narrow_band_least_squares_tpu.ops.kernels.fused_xcorr import (
                precompute_fused_tables,
            )
            from narrow_band_least_squares_tpu.ops.windows import (
                build_bucket_grids,
            )
            bgrids = build_bucket_grids(
                plan, ratio=bucket_ratio, max_lag=max_lag,
                slack=bucket_slack,
            )
            self._fused_buckets = []
            for g in bgrids:
                bml = (min(max_lag, g.Lmax - 1)
                       if max_lag is not None else None)
                ftab = precompute_fused_tables(
                    g.Lmax, pairs, self.nchans, dtype=np.dtype(dtype),
                    max_lag=bml,
                )
                half = g.Lmax - 1 if bml is None else bml
                bh = np.minimum(g.lengths.astype(np.int64) - 1, half)
                hop = np.asarray(
                    [plan.windows[int(b)].hop for b in g.band_idx],
                    dtype=np.int32,
                )
                maxstart = (
                    plan.npts - g.lengths.astype(np.int64)
                ).astype(np.int32)
                self._fused_buckets.append({
                    "band_idx": g.band_idx,
                    "Wmax": g.Wmax,
                    "lag_min": ftab["lag_min"],
                    "hop": jnp.asarray(hop[:, None]),
                    "maxstart": jnp.asarray(maxstart[:, None]),
                    "lo": jnp.asarray((half - bh)[:, None], jnp.int32),
                    "hi": jnp.asarray((half + bh)[:, None], jnp.int32),
                    "len_mask": jnp.asarray(
                        g.len_mask.reshape(len(g.band_idx), g.Lmax), dtype
                    ),
                    "tables": {
                        k: (jnp.asarray(v) if isinstance(v, np.ndarray)
                            else v)
                        for k, v in ftab.items()
                    },
                })
            order = np.concatenate([g.band_idx for g in bgrids])
            self._bucket_inv_perm = np.argsort(order).astype(np.int32)
        if self.band_limit_db and (
            xcorr_method != "mxu" or self.sos_list is None
        ):
            logger.warning(
                "band_limit_db needs xcorr_method='mxu' and an in-pipeline "
                "filter bank (apply_filter=True); ignoring"
            )
            self.band_limit_db = 0.0

        def _limit(tab, band_idx, nfft):
            if not self.band_limit_db:
                return tab
            if self.band_limit_db == "auto":
                bts = plan.bt_products()
                db = band_limit_auto_db(
                    min(bts[int(b)] for b in band_idx)
                )
            else:
                db = float(self.band_limit_db)
            kmin, kmax = XC.band_limit_bins(
                self.sos_list, band_idx, nfft, plan.fs,
                db, zerophase=self.zerophase,
            )
            return XC.slice_tables_bins(tab, kmin, kmax)

        if xcorr_method in ("mxu", "pallas"):
            if xcorr_method == "mxu":
                tab = XC.precompute_dft_tables(
                    grid.Lmax, dtype=np.dtype(dtype), max_lag=max_lag
                )
                tab = _limit(tab, range(plan.nbands), tab["nfft"])
            else:
                tab = XC.precompute_pallas_tables(
                    grid.Lmax, grid.lengths, dtype=np.dtype(dtype),
                    max_lag=max_lag,
                )
            self._dft_tables = {
                k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                for k, v in tab.items()
            }
            if self.bucket_bands:
                from narrow_band_least_squares_tpu.ops.windows import (
                    build_bucket_grids,
                )
                bgrids = build_bucket_grids(
                    plan, ratio=bucket_ratio, max_lag=max_lag,
                    slack=bucket_slack,
                )
                self._buckets = []
                for g in bgrids:
                    bml = (min(max_lag, g.Lmax - 1)
                           if max_lag is not None else None)
                    if xcorr_method == "mxu":
                        btab = XC.precompute_dft_tables(
                            g.Lmax, dtype=np.dtype(dtype), max_lag=bml,
                        )
                        btab = _limit(btab, g.band_idx, btab["nfft"])
                    else:
                        btab = XC.precompute_pallas_tables(
                            g.Lmax, g.lengths, dtype=np.dtype(dtype),
                            max_lag=bml,
                        )
                    bhalf = g.lengths.astype(np.int64) - 1
                    if max_lag is not None:
                        bhalf = np.minimum(bhalf, max_lag)
                    self._buckets.append({
                        "grid": g,
                        "band_idx": g.band_idx,
                        "lag_half": jnp.asarray(bhalf, jnp.int32),
                        "idx": jnp.asarray(g.idx),
                        "len_mask": jnp.asarray(g.len_mask, dtype),
                        "lengths": jnp.asarray(g.lengths, dtype),
                        "lag_mask": jnp.asarray(g.lag_mask),
                        "tables": {
                            k: (jnp.asarray(v) if isinstance(v, np.ndarray)
                                else v)
                            for k, v in btab.items()
                        },
                    })
                order = np.concatenate([g.band_idx for g in bgrids])
                self._bucket_inv_perm = np.argsort(order).astype(np.int32)

        # ---- window timestamps (host) ----
        self._t_epoch_rel = np.zeros((plan.nbands, plan.width))
        for b, wp in enumerate(plan.windows):
            te = wp.end_times_epoch(0.0, plan.fs)
            self._t_epoch_rel[b, : wp.n_windows] = te

        self._step = jax.jit(self._make_step())
        self._step_batch = jax.jit(jax.vmap(self._make_step()))

    # ------------------------------------------------------------------
    def _delays(self, y: jnp.ndarray):
        """Filtered bank (B, C, T) -> (tau, rho, mdccm) over the window grid.

        The extract->xcorr front half of the step, shared by the sharded
        and multi-array pipelines so they inherit the bucketed/strided/
        fast-mode optimizations."""
        plan = self.plan
        if self.xcorr_method == "fused":
            return self._xcorr_fused(y)
        if self.bucket_bands:
            return self._xcorr_bucketed(y)
        win = self._extract(y)
        if self.xcorr_method == "mxu":
            return self._xcorr_mxu_chunked(
                win, self._lag_mask, self._dft_tables, self._lag_half,
            )
        if self.xcorr_method == "pallas":
            return XC.cross_correlate_pallas(
                win, self._pairs, self._dft_tables, plan.fs,
                interpret=self._pallas_interpret,
                precision=self.matmul_precision,
            )
        return XC.cross_correlate(
            win, self._pairs, self._lag_mask, self.nfft_corr, plan.fs
        )

    def _delays_batched(self, y: jnp.ndarray):
        """Batched-array delays: (A, B, C, T) -> (tau, rho, mdccm) of shape
        (A, B, Wmax, P) / (A, B, Wmax).

        Merges the array axis into the *window* axis before the xcorr
        matmuls — one (B, A*W, ...) program instead of A vmapped programs —
        so the MXU/HBM see a single large batch.  (vmap over arrays
        measured 75k -> 31k windows/s going 2 -> 8 arrays on v5e; the merge
        keeps per-window cost flat.)  Numerically identical to vmapping
        `_delays`.
        """
        A, B = y.shape[0], y.shape[1]
        plan = self.plan
        Wmax = plan.max_windows

        if self.xcorr_method == "fused":
            return self._xcorr_fused(
                y.reshape((A * B,) + y.shape[2:]), arrays=A
            )

        def merge(win):
            # (A, Bg, Wg, C, Lg) -> (Bg, A*Wg, C, Lg)
            Ag, Bg, Wg, C, Lg = win.shape
            return jnp.transpose(win, (1, 0, 2, 3, 4)).reshape(
                Bg, Ag * Wg, C, Lg
            )

        def split(t, Wg):
            # (Bg, A*Wg, ...) -> (A, Bg, Wg, ...)
            Bg = t.shape[0]
            rest = t.shape[2:]
            return jnp.transpose(
                t.reshape(Bg, A, Wg) if not rest
                else t.reshape((Bg, A, Wg) + rest),
                (1, 0, 2) + tuple(range(3, t.ndim + 1)),
            )

        if self.bucket_bands:
            taus, rhos, mds = [], [], []
            for bk in self._buckets:
                if self.window_method == "strided":
                    win = jax.vmap(
                        lambda yb: extract_windows_strided_bucket(
                            yb, plan.windows, bk["grid"], bk["len_mask"],
                            bk["lengths"],
                        )
                    )(y)
                else:
                    win = jax.vmap(
                        lambda yb: extract_windows(
                            yb[bk["band_idx"]], bk["idx"], bk["len_mask"],
                            bk["lengths"],
                        )
                    )(y)
                Wg = win.shape[2]
                tau, rho, md = self._xcorr_mxu_chunked(
                    merge(win), bk["lag_mask"], bk["tables"], bk["lag_half"],
                )
                tau, rho, md = split(tau, Wg), split(rho, Wg), split(md, Wg)
                pad = Wmax - Wg
                if pad:
                    tau = jnp.pad(tau, ((0, 0), (0, 0), (0, pad), (0, 0)))
                    rho = jnp.pad(rho, ((0, 0), (0, 0), (0, pad), (0, 0)))
                    md = jnp.pad(md, ((0, 0), (0, 0), (0, pad)))
                taus.append(tau)
                rhos.append(rho)
                mds.append(md)
            inv = self._bucket_inv_perm
            return (
                jnp.concatenate(taus, axis=1)[:, inv],
                jnp.concatenate(rhos, axis=1)[:, inv],
                jnp.concatenate(mds, axis=1)[:, inv],
            )

        win = jax.vmap(self._extract)(y)           # (A, B, Wmax, C, Lmax)
        if self.xcorr_method == "mxu":
            tau, rho, md = self._xcorr_mxu_chunked(
                merge(win), self._lag_mask, self._dft_tables, self._lag_half,
            )
        elif self.xcorr_method == "pallas":
            tau, rho, md = XC.cross_correlate_pallas(
                merge(win), self._pairs, self._dft_tables, plan.fs,
                interpret=self._pallas_interpret,
                precision=self.matmul_precision,
            )
        else:
            tau, rho, md = XC.cross_correlate(
                merge(win), self._pairs, self._lag_mask, self.nfft_corr,
                plan.fs,
            )
        return split(tau, Wmax), split(rho, Wmax), split(md, Wmax)

    def _solve_masked(self, tau, mdccm, win_mask=None):
        """Slowness solve + window-validity masking (closure constants)."""
        if self.alpha == 1.0:
            out = SOLVE.ols_solve(tau, self._X, self._pinv, self._XtX_inv)
            retained = None
        else:
            out = LTS.lts_solve(
                tau, self._X, self._cand, self._Ainv, self._cand_ok,
                self.h, self.c_steps,
                candidate_chunk=self.lts_candidate_chunk,
                funnel_k=self.lts_funnel_k,
            )
            retained = out["retained"]
        wm = self._win_mask if win_mask is None else win_mask
        res = {
            k: jnp.where(wm, out[k], 0.0)
            for k in ("vel", "baz", "sig_tau", "vel_uncert", "baz_uncert")
        }
        res["mdccm"] = jnp.where(wm, mdccm, 0.0)
        if retained is not None:
            res["flags"] = (~retained) & wm[..., None]
        return res

    def _core(self, y: jnp.ndarray, win_mask=None) -> Dict[str, jnp.ndarray]:
        """Everything after filtering: extract -> xcorr -> solve -> mask.

        Stage boundaries are optimization barriers: each stage then compiles
        as its own fusion island, so its numerics do not depend on the
        surrounding program shape (single-array vs merged multi-array vs
        sharded).  Without the barriers, XLA reassociates the reductions
        differently per program and last-ulp wiggles flip near-tied
        argmax/funnel selections (the round-2 merged-vs-individual parity
        break).  The stages are matmul/FFT-dominated, so the lost
        cross-stage elementwise fusion is noise.
        """
        y = jax.lax.optimization_barrier(y)
        tau, rho, mdccm = jax.lax.optimization_barrier(self._delays(y))
        return self._solve_masked(tau, mdccm, win_mask)

    def _make_step(self):
        plan = self.plan
        apply_filter = self.apply_filter

        def step(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
            x = x.astype(self.dtype)
            if apply_filter:
                y = F.filter_bank_fft(
                    x, self._h_bank, self._taper, self.nfft_filter,
                    self.zerophase,
                )
            else:
                # ltsva contract: caller already filtered+tapered the data
                y = jnp.broadcast_to(x[None], (plan.nbands,) + x.shape)
            return self._core(y)

        return step

    def _xcorr_fused(self, y, arrays: int = 1):
        """Megakernel delays: (B, C, T) or (A*B, C, T) -> (tau, rho, mdccm).

        One `fused_xcorr_bucket` launch per window-length bucket; windows,
        spectra, cross-spectra and the correlation never touch HBM (see
        ops.kernels.fused_xcorr).  With ``arrays > 1`` the leading axis is
        A merged arrays: bucket rows become (A*Bg) band rows sharing the
        same static shapes.
        """
        from narrow_band_least_squares_tpu.ops.kernels.fused_xcorr import (
            fused_xcorr_bucket,
        )

        plan = self.plan
        Wmax = plan.max_windows
        B = plan.nbands
        A = arrays
        taus, rhos, mds = [], [], []
        for bk in self._fused_buckets:
            t = bk["tables"]
            bidx = bk["band_idx"]
            if A > 1:
                rows = np.concatenate([a * B + bidx for a in range(A)])
            else:
                rows = bidx
            rep = (lambda v: jnp.tile(v, (A, 1))) if A > 1 else (lambda v: v)
            rho, idx = fused_xcorr_bucket(
                y[rows], rep(bk["hop"]), rep(bk["maxstart"]),
                rep(bk["lo"]), rep(bk["hi"]),
                rep(bk["len_mask"]),
                t["Cf"], t["Sf"], t["Ec"], t["Es"], t["sbi"], t["sbj"],
                Wmax=bk["Wmax"], T=plan.npts,
                interpret=self._pallas_interpret,
                precision=self.matmul_precision,
            )
            rho = rho[:, :bk["Wmax"]]
            idx = idx[:, :bk["Wmax"]]
            tau = (idx.astype(y.dtype) + bk["lag_min"]) / plan.fs
            md = jnp.median(rho, axis=-1)
            pad = Wmax - rho.shape[1]
            if pad:
                tau = jnp.pad(tau, ((0, 0), (0, pad), (0, 0)))
                rho = jnp.pad(rho, ((0, 0), (0, pad), (0, 0)))
                md = jnp.pad(md, ((0, 0), (0, pad)))
            if A > 1:
                Bg = len(bidx)
                tau = tau.reshape((A, Bg) + tau.shape[1:])
                rho = rho.reshape((A, Bg) + rho.shape[1:])
                md = md.reshape((A, Bg) + md.shape[1:])
            taus.append(tau)
            rhos.append(rho)
            mds.append(md)
        ax = 1 if A > 1 else 0
        inv = self._bucket_inv_perm
        take = (lambda v: v[:, inv]) if A > 1 else (lambda v: v[inv])
        return (
            take(jnp.concatenate(taus, axis=ax)),
            take(jnp.concatenate(rhos, axis=ax)),
            take(jnp.concatenate(mds, axis=ax)),
        )

    def _xcorr_bucketed(self, y):
        """Per-winlen-bucket xcorr: compact (Wmax_g, Lmax_g) grids per bucket.

        A dense-band sweep pads every band to the global Lmax AND Wmax; the
        buckets cut both MXU matmuls to near their true sizes, then the
        results are re-assembled into the full (B, Wmax, P) grid."""
        plan = self.plan
        Wmax = plan.max_windows
        taus, rhos, mds = [], [], []
        for bk in self._buckets:
            if self.window_method == "strided":
                win = extract_windows_strided_bucket(
                    y, plan.windows, bk["grid"], bk["len_mask"],
                    bk["lengths"],
                )
            else:
                yb = y[bk["band_idx"]]                  # (Bg, C, T)
                win = extract_windows(
                    yb, bk["idx"], bk["len_mask"], bk["lengths"]
                )
            if self.xcorr_method == "pallas":
                tau, rho, md = XC.cross_correlate_pallas(
                    win, self._pairs, bk["tables"], plan.fs,
                    interpret=self._pallas_interpret,
                    precision=self.matmul_precision,
                )
            else:
                tau, rho, md = self._xcorr_mxu_chunked(
                    win, bk["lag_mask"], bk["tables"], bk["lag_half"],
                )
            pad = Wmax - tau.shape[1]
            if pad:
                tau = jnp.pad(tau, ((0, 0), (0, pad), (0, 0)))
                rho = jnp.pad(rho, ((0, 0), (0, pad), (0, 0)))
                md = jnp.pad(md, ((0, 0), (0, pad)))
            taus.append(tau)
            rhos.append(rho)
            mds.append(md)
        inv = self._bucket_inv_perm
        return (
            jnp.concatenate(taus, axis=0)[inv],
            jnp.concatenate(rhos, axis=0)[inv],
            jnp.concatenate(mds, axis=0)[inv],
        )

    def _xcorr_mxu_chunked(self, win, lag_mask, tables, lag_half):
        """MXU xcorr with the band axis chunked to cap the cc tensor size.

        See the `xcorr_chunk_mb` constructor note: one program over a
        multi-hundred-MB (B, W, P, nlag) tensor tiles badly on v5e; slices
        of a few bands each (unrolled in the same jit) run at roofline.
        With `xcorr_lag_tile` on, the per-chunk cc tensor never fully
        materializes either — the chunk size then mostly bounds the live
        cross-spectra, and the two knobs compose.
        """
        plan = self.plan
        Bg, Wg = win.shape[0], win.shape[1]
        nlag = lag_mask.shape[-1]
        per_band = Wg * self._pairs.shape[0] * nlag * 4
        cb = (
            max(1, self.xcorr_chunk_bytes // per_band)
            if self.xcorr_chunk_bytes else Bg
        )
        if cb >= Bg:
            return XC.cross_correlate_mxu(
                win, self._pairs, lag_mask, tables, plan.fs,
                precision=self.matmul_precision,
                subsample=self.subsample_delays,
                lag_tile=self.xcorr_lag_tile,
            )
        outs = [
            XC.cross_correlate_mxu(
                win[b0:b0 + cb], self._pairs, lag_mask[b0:b0 + cb],
                tables, plan.fs,
                precision=self.matmul_precision,
                subsample=self.subsample_delays,
                lag_tile=self.xcorr_lag_tile,
            )
            for b0 in range(0, Bg, cb)
        ]
        return tuple(jnp.concatenate(p, axis=0) for p in zip(*outs))

    def _extract(self, y):
        """Window extraction: 'gather' | 'patches' (im2col) | 'strided'."""
        if self.window_method == "strided":
            return extract_windows_strided(
                y, self.plan, self._len_mask, self._lengths
            )
        if self.window_method == "patches":
            return extract_windows_patches(
                y, self.plan, self._len_mask, self._lengths
            )
        return extract_windows(y, self._idx, self._len_mask, self._lengths)

    # ------------------------------------------------------------------
    def run(self, st: ArrayStream, freq_resp_list: Optional[np.ndarray] = None
            ) -> NarrowBandResult:
        """Execute on one ArrayStream (shape-checked against the plan)."""
        if st.npts != self.plan.npts:
            raise ValueError(
                f"stream has {st.npts} samples but plan was built for {self.plan.npts}"
            )
        dev = self._step(jnp.asarray(st.data, self.dtype))
        return self._package(dev, st.start_epoch, freq_resp_list)

    def run_raw(self, data: np.ndarray) -> Dict[str, jnp.ndarray]:
        """Raw device outputs for one (C, T) array (benchmark path)."""
        return self._step(jnp.asarray(data, self.dtype))

    def run_batch_raw(self, data: np.ndarray) -> Dict[str, jnp.ndarray]:
        """Raw device outputs for a batch (A, C, T) of arrays (vmapped)."""
        return self._step_batch(jnp.asarray(data, self.dtype))

    # ------------------------------------------------------------------
    def _package(
        self, dev: Dict[str, jnp.ndarray], start_epoch: float,
        freq_resp_list: Optional[np.ndarray],
    ) -> NarrowBandResult:
        plan = self.plan
        B, width, Wmax = plan.nbands, plan.width, plan.max_windows

        def dense(name):
            a = np.zeros((B, width))
            a[:, :Wmax] = np.asarray(dev[name], dtype=np.float64)
            return a

        t_array = epoch_to_datenum(
            np.where(self._t_epoch_rel > 0, self._t_epoch_rel + start_epoch, 0.0)
        )
        flags = (
            np.asarray(dev["flags"]) if "flags" in dev else None
        )
        w_array = h_array = None
        if self.sos_list is not None and freq_resp_list is not None:
            w_array, h_array = F.sosfreqz_bank(
                self.sos_list, np.asarray(freq_resp_list), plan.fs
            )
        return NarrowBandResult(
            vel_array=dense("vel"),
            baz_array=dense("baz"),
            mdccm_array=dense("mdccm"),
            t_array=t_array,
            sig_tau_array=dense("sig_tau"),
            vel_uncert_array=dense("vel_uncert"),
            baz_uncert_array=dense("baz_uncert"),
            num_compute_list=list(plan.num_compute_list),
            flags=flags,
            pairs=self.pairs_np,
            nchans=self.nchans,
            plan=plan,
            w_array=w_array,
            h_array=h_array,
        )
