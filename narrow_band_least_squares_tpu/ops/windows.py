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
from typing import Tuple

import numpy as np

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
