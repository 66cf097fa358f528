"""Window extraction: the ragged (band, window) grid as dense gathers + masks.

The reference's solver slides windows band-by-band in Python (SURVEY §3.4);
band b has its own window length and hop, so the (band, window) space is
ragged.  TPU-native form: pad to ``(B, Wmax, C, Lmax)`` with two static masks
(valid-window and valid-sample), computed once on host as gather indices.
This is exactly the dense-prefix + ``num_compute_list`` contract the
reference's outputs already follow (``narrow_band_least_squares.py:104-108``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from narrow_band_least_squares_tpu.utils.plan import NarrowBandPlan


@dataclass(frozen=True)
class WindowGrid:
    """Static gather plan for the dense (band, window, sample) grid."""

    idx: np.ndarray          # (B, Wmax, Lmax) int32 gather indices into T
    win_mask: np.ndarray     # (B, Wmax) bool — window exists for this band
    len_mask: np.ndarray     # (B, 1, 1, Lmax) float — sample within band winlen
    lengths: np.ndarray      # (B,) int32 winlensamp per band
    lag_mask: np.ndarray     # (B, 2*Lmax-1) bool — |lag| <= winlensamp-1
    Wmax: int
    Lmax: int

    @property
    def nbands(self) -> int:
        return self.idx.shape[0]


def build_window_grid(plan: NarrowBandPlan) -> WindowGrid:
    B = plan.nbands
    Wmax = plan.max_windows
    Lmax = plan.max_winlensamp

    idx = np.zeros((B, Wmax, Lmax), dtype=np.int32)
    win_mask = np.zeros((B, Wmax), dtype=bool)
    len_mask = np.zeros((B, Lmax), dtype=np.float64)
    lengths = np.zeros((B,), dtype=np.int32)
    lag_mask = np.zeros((B, 2 * Lmax - 1), dtype=bool)
    lags = np.arange(-(Lmax - 1), Lmax)

    for b, wp in enumerate(plan.windows):
        L = wp.winlensamp
        lengths[b] = L
        len_mask[b, :L] = 1.0
        lag_mask[b] = np.abs(lags) <= (L - 1)
        for w, s0 in enumerate(wp.starts):
            win_mask[b, w] = True
            # out-of-range tail samples clamp to the window start (masked out)
            idx[b, w, :L] = s0 + np.arange(L)
            idx[b, w, L:] = s0
    return WindowGrid(
        idx=idx,
        win_mask=win_mask,
        len_mask=len_mask.reshape(B, 1, 1, Lmax),
        lengths=lengths,
        lag_mask=lag_mask,
        Wmax=Wmax,
        Lmax=Lmax,
    )


@dataclass(frozen=True)
class BucketGrid:
    """One window-length bucket of bands: a compact sub-grid.

    Bands whose window lengths are close share one padded (Wmax_g, Lmax_g)
    grid; a dense-band sweep (e.g. 50 adaptive bands, 30..60 s) otherwise
    pads every band to the globally largest window AND the globally largest
    window count, wasting ~2-3x of both the spectra and inverse-correlation
    matmuls (the two MXU hot spots in ops/xcorr.py)."""

    band_idx: np.ndarray     # (Bg,) int32 band indices into the full plan
    idx: np.ndarray          # (Bg, Wmax_g, Lmax_g) gather indices
    len_mask: np.ndarray     # (Bg, 1, 1, Lmax_g) float
    lengths: np.ndarray      # (Bg,) int32
    lag_mask: np.ndarray     # (Bg, nlag_g) bool
    Wmax: int
    Lmax: int


def bucket_by_cost(
    lens: np.ndarray,        # (n,) window length per item, any order
    wins: np.ndarray,        # (n,) window count per item
    slack: float = 1.08,
) -> list:
    """Group items (bands or band-slots) into padded-shape buckets by cost.

    Items are walked in descending window length; an item joins the current
    bucket only while the bucket's *padded* xcorr cost (items x Wmax x
    Lmax^2, the shape everything in the bucket is padded to) stays within
    ``slack`` of the sum of per-item true costs.  This accounts for both
    the L padding (the old length-ratio rule) and the W padding the old
    rule ignored — window counts grow as lengths shrink, so merging bands
    of similar L but different W inflated the matmuls up to ~1.4x
    (measured 22% step overhead on the nb=2 band-sharded canonical plan).
    The small fixed per-bucket program overhead is what ``slack`` buys.
    Returns a list of index groups (into the input arrays).
    """
    lens = np.asarray(lens, dtype=np.int64)
    wins = np.asarray(wins, dtype=np.int64)
    order = np.argsort(-lens, kind="stable")
    groups: list = []
    cur: list = []
    cur_true = 0.0
    for i in order:
        i = int(i)
        cand = cur + [i]
        Lg = int(lens[cand].max())
        Wg = int(wins[cand].max())
        true = cur_true + float(wins[i]) * float(lens[i]) ** 2
        padded = len(cand) * float(Wg) * float(Lg) ** 2
        if not cur or padded <= slack * true:
            cur = cand
            cur_true = true
        else:
            groups.append(cur)
            cur = [i]
            cur_true = float(wins[i]) * float(lens[i]) ** 2
    if cur:
        groups.append(cur)
    return groups


def build_bucket_grids(
    plan: NarrowBandPlan,
    ratio: float = 1.3,
    max_lag: int | None = None,
    slack: float = 1.08,
) -> list:
    """Partition bands into window-length buckets and build each sub-grid.

    Bands are grouped by padded-cost (`bucket_by_cost`, which bounds both
    the L and the W padding of each bucket's static shapes); each bucket
    gets its own compact gather/mask grid (its own Lmax and Wmax).  With
    ``max_lag`` the per-bucket lag range is additionally capped to
    ``[-max_lag, max_lag]`` (clamped to the bucket's own Lmax-1).
    ``ratio`` is kept for API compatibility; it no longer drives the
    grouping.
    """
    lens = np.array([wp.winlensamp for wp in plan.windows])
    wins = np.array([wp.n_windows for wp in plan.windows])
    buckets = bucket_by_cost(lens, wins, slack=slack)

    grids = []
    for band_list in buckets:
        wps = [plan.windows[b] for b in band_list]
        Lmax = max(wp.winlensamp for wp in wps)
        Wmax = max(wp.n_windows for wp in wps)
        half = Lmax - 1 if max_lag is None else min(int(max_lag), Lmax - 1)
        nlag = 2 * half + 1
        lags = np.arange(-half, half + 1)

        Bg = len(band_list)
        idx = np.zeros((Bg, Wmax, Lmax), dtype=np.int32)
        len_mask = np.zeros((Bg, Lmax), dtype=np.float64)
        lengths = np.zeros((Bg,), dtype=np.int32)
        lag_mask = np.zeros((Bg, nlag), dtype=bool)
        for g, wp in enumerate(wps):
            L = wp.winlensamp
            lengths[g] = L
            len_mask[g, :L] = 1.0
            lag_mask[g] = np.abs(lags) <= (L - 1)
            for w, s0 in enumerate(wp.starts):
                idx[g, w, :L] = s0 + np.arange(L)
                idx[g, w, L:] = s0
        grids.append(BucketGrid(
            band_idx=np.asarray(band_list, dtype=np.int32),
            idx=idx,
            len_mask=len_mask.reshape(Bg, 1, 1, Lmax),
            lengths=lengths,
            lag_mask=lag_mask,
            Wmax=Wmax,
            Lmax=Lmax,
        ))
    return grids


def mask_demean(
    win: jnp.ndarray,        # (B, Wmax, C, Lmax) raw windows
    len_mask: jnp.ndarray,   # (B, 1, 1, Lmax)
    lengths: jnp.ndarray,    # (B,) float — winlensamp per band
) -> jnp.ndarray:
    """Shared tail of every extractor: zero-pad + per-window demean."""
    win = win * len_mask
    mean = jnp.sum(win, axis=-1, keepdims=True) / lengths[:, None, None, None]
    return (win - mean) * len_mask


def _strided_band(yb: jnp.ndarray, wp, Wmax: int, Lmax: int) -> jnp.ndarray:
    """One band's windows as interleaved strided reshapes -> (Wmax, C, Lmax).

    Windows overlap, but the subset {w : w ≡ k (mod m)} with
    ``m = ceil(L/hop)`` is non-overlapping, so each subset is a plain
    reshape of a strided slice; m such reshapes interleave into the full
    window set.  All shapes static — XLA emits copies, no gather."""
    C, T = yb.shape
    L, hop = wp.winlensamp, wp.hop
    m = -(-L // hop)                      # ceil
    W_pad = -(-Wmax // m)
    stride = m * hop
    need = stride * W_pad + stride        # headroom for the k offsets
    yb = jnp.pad(yb, ((0, 0), (0, max(0, need - T))))
    parts = []
    for k in range(m):
        seg = jax.lax.dynamic_slice_in_dim(
            yb, k * hop, W_pad * stride, axis=-1
        ).reshape(C, W_pad, stride)[..., :Lmax]
        if stride < Lmax:
            seg = jnp.pad(seg, ((0, 0), (0, 0), (0, Lmax - stride)))
        parts.append(seg)
    inter = jnp.stack(parts, axis=2)      # (C, W_pad, m, Lmax)
    wins = inter.reshape(C, W_pad * m, Lmax)[:, :Wmax, :]
    return jnp.transpose(wins, (1, 0, 2))


def extract_windows_strided(
    y: jnp.ndarray,          # (B, C, T) filtered waveforms
    plan: NarrowBandPlan,
    len_mask: jnp.ndarray,   # (B, 1, 1, Lmax)
    lengths: jnp.ndarray,    # (B,) float
) -> jnp.ndarray:
    """Gather-free window extraction (see `_strided_band`); equivalent to
    `extract_windows` (same demean + masking).  ~5x faster than the gather
    on TPU (v5e: 1.2 ms vs 5.9 ms on the canonical workload)."""
    B, C, T = y.shape
    Wmax, Lmax = plan.max_windows, plan.max_winlensamp
    win = jnp.stack(
        [_strided_band(y[b], wp, Wmax, Lmax)
         for b, wp in enumerate(plan.windows)],
        axis=0,
    )                                         # (B, Wmax, C, Lmax)
    win = win * len_mask
    mean = jnp.sum(win, axis=-1, keepdims=True) / lengths[:, None, None, None]
    return (win - mean) * len_mask


def extract_windows_strided_bucket(
    y: jnp.ndarray,          # (B, C, T) FULL filtered bank
    windows,                 # full plan.windows tuple
    bucket: "BucketGrid",
    len_mask: jnp.ndarray,   # (Bg, 1, 1, Lmax_g)
    lengths: jnp.ndarray,    # (Bg,) float
) -> jnp.ndarray:
    """Strided extraction for one window-length bucket -> (Bg, Wmax_g, C, Lmax_g)."""
    win = jnp.stack(
        [_strided_band(y[int(b)], windows[int(b)], bucket.Wmax, bucket.Lmax)
         for b in bucket.band_idx],
        axis=0,
    )
    win = win * len_mask
    mean = jnp.sum(win, axis=-1, keepdims=True) / lengths[:, None, None, None]
    return (win - mean) * len_mask


def extract_windows_patches(
    y: jnp.ndarray,          # (B, C, T) filtered waveforms
    plan: NarrowBandPlan,
    len_mask: jnp.ndarray,   # (B, 1, 1, Lmax)
    lengths: jnp.ndarray,    # (B,) float
) -> jnp.ndarray:
    """Window extraction via im2col (`conv_general_dilated_patches`).

    Static per-band stride/size — no gather op; XLA lowers the patch
    extraction onto its conv machinery.  Same demean/mask contract as
    `extract_windows`.
    """
    B, C, T = y.shape
    Wmax, Lmax = plan.max_windows, plan.max_winlensamp
    ypad = jnp.pad(y, ((0, 0), (0, 0), (0, Lmax)))
    per_band = []
    for b, wp in enumerate(plan.windows):
        pats = jax.lax.conv_general_dilated_patches(
            ypad[b][:, None, :],             # (C, 1, T+Lmax)
            filter_shape=(Lmax,),
            window_strides=(wp.hop,),
            padding="VALID",
        )                                     # (C, Lmax, W')
        pats = pats[:, :, :Wmax]
        if pats.shape[-1] < Wmax:
            pats = jnp.pad(
                pats, ((0, 0), (0, 0), (0, Wmax - pats.shape[-1]))
            )
        per_band.append(jnp.transpose(pats, (2, 0, 1)))  # (Wmax, C, Lmax)
    win = jnp.stack(per_band, axis=0)
    win = win * len_mask
    mean = jnp.sum(win, axis=-1, keepdims=True) / lengths[:, None, None, None]
    return (win - mean) * len_mask


def extract_windows(
    y: jnp.ndarray,          # (B, C, T) filtered waveforms
    idx: jnp.ndarray,        # (B, Wmax, Lmax)
    len_mask: jnp.ndarray,   # (B, 1, 1, Lmax)
    lengths: jnp.ndarray,    # (B,) float — winlensamp per band
) -> jnp.ndarray:
    """Gather, demean (over valid samples) and mask windows.

    Returns (B, Wmax, C, Lmax); padded samples are exactly zero so downstream
    FFTs see zero-padded windows.
    """
    B, C, T = y.shape
    # y[b, c, idx[b, w, l]] -> (B, C, Wmax, Lmax) -> (B, Wmax, C, Lmax)
    win = jnp.take_along_axis(
        y[:, :, None, :],                              # (B, C, 1, T)
        idx[:, None, :, :],                            # (B, 1, W, L)
        axis=-1,
    )
    win = jnp.transpose(win, (0, 2, 1, 3))             # (B, W, C, L)
    win = win * len_mask
    mean = jnp.sum(win, axis=-1, keepdims=True) / lengths[:, None, None, None]
    return (win - mean) * len_mask
