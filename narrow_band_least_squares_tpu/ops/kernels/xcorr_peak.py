"""Pallas TPU kernel: fused inverse-DFT correlation + masked peak search.

The MXU cross-correlation path (ops.xcorr.cross_correlate_mxu) ends with

    cc = CS2 @ E2          # (R, nlag) — R = bands*windows*pairs
    peak, idx = masked argmax over lags

XLA materializes the full (R, nlag) correlation tensor in HBM (~170 MB for
the canonical workload) and re-reads it for the argmax.  This kernel tiles
the matmul over (row, lag) blocks and keeps a running (max, argmax)
accumulator in VMEM, so the correlation tensor never exists in HBM — the
MXU output is consumed by the peak search in-register.

Tie-break matches ``jnp.argmax`` (first maximum): lag tiles are visited in
ascending order and only strictly-greater values update the accumulator.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _peak_kernel(cs_ref, e_ref, lo_ref, hi_ref, peak_ref, idx_ref,
                 best_ref, bidx_ref, *, tile_lags: int, precision):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref[:], -jnp.inf)
        bidx_ref[:] = jnp.zeros_like(bidx_ref[:])

    cc = jnp.dot(
        cs_ref[:], e_ref[:],
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                                   # (TR, TL)
    col = j * tile_lags + jax.lax.broadcasted_iota(jnp.int32, cc.shape, 1)
    valid = (col >= lo_ref[:]) & (col <= hi_ref[:])     # (TR,1) broadcast
    ccm = jnp.where(valid, cc, -jnp.inf)

    tmax = jnp.max(ccm, axis=1, keepdims=True)          # (TR, 1)
    targ = (
        jnp.argmax(ccm, axis=1).astype(jnp.int32).reshape(-1, 1)
        + j * tile_lags
    )
    better = tmax > best_ref[:]
    best_ref[:] = jnp.where(better, tmax, best_ref[:])
    bidx_ref[:] = jnp.where(better, targ, bidx_ref[:])

    @pl.when(j == nj - 1)
    def _():
        peak_ref[:] = best_ref[:]
        idx_ref[:] = bidx_ref[:]


def _pick_tiles(K2: int, R: int, nlag: int) -> Tuple[int, int]:
    """Row/lag tile sizes that keep HBM traffic minimal.

    The cs2 block index is (i, 0) — constant across the inner lag sweep —
    so cs2 streams from HBM exactly once; e2 streams once per ROW tile.
    Total traffic = |cs2| + |e2| * ceil(R / tile_rows): maximize tile_rows
    under the VMEM budget (double-buffered blocks), keep tile_lags at the
    128-lane minimum.  (Round-1 default was tile_rows=128, which re-streamed
    the ~23 MB canonical e2 137x = 3.3 GB; this cuts it ~4x.)
    """
    tile_lags = 128
    # double-buffered input blocks ~ 8*K2*(tile_rows + tile_lags) bytes,
    # plus kernel temporaries (cc tile, mask, iota, argmax) of a few
    # tile_rows x tile_lags buffers — budget well under the 16 MiB scoped
    # VMEM limit (13 MiB OOM'd by 440 KB on the canonical bucket)
    budget = 10 * 1024 * 1024
    tr = budget // (8 * K2) - tile_lags
    tile_rows = max(128, min(1024, (tr // 128) * 128))
    return tile_rows, tile_lags


@functools.partial(
    jax.jit,
    static_argnames=(
        "nlag", "tile_rows", "tile_lags", "interpret", "precision"
    ),
)
def icorr_peak(
    cs2: jnp.ndarray,        # (R, K2) stacked [Re(CS) | Im(CS)]
    e2: jnp.ndarray,         # (K2, nlag_padded) stacked [Ec ; -Es]
    lo: jnp.ndarray,         # (R, 1) int32 first valid lag index per row
    hi: jnp.ndarray,         # (R, 1) int32 last valid lag index per row
    nlag: int,
    tile_rows: int | None = None,
    tile_lags: int | None = None,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ``argmax_l (cs2 @ e2)[:, lo:hi]``.  Returns (peak (R,), idx (R,)).

    Padding contract: callers pad K2 / lag columns with zeros and rows
    arbitrarily; rows are masked by [lo, hi] bounds only.

    ``precision`` applies to the in-kernel matmul; HIGH (bf16x3) matches
    the unfused MXU path's default and roughly halves the MXU passes vs
    HIGHEST.
    """
    R, K2 = cs2.shape
    auto_tr, auto_tl = _pick_tiles(K2, R, nlag)
    if tile_rows is None:
        tile_rows = auto_tr
    if tile_lags is None:
        tile_lags = auto_tl
    Rp = _round_up(R, tile_rows)
    Lp = _round_up(e2.shape[1], tile_lags)
    cs2 = jnp.pad(cs2, ((0, Rp - R), (0, 0)))
    e2 = jnp.pad(e2, ((0, 0), (0, Lp - e2.shape[1])))
    lo = jnp.pad(lo, ((0, Rp - R), (0, 0)))
    hi = jnp.pad(hi, ((0, Rp - R), (0, 0)))

    grid = (Rp // tile_rows, Lp // tile_lags)
    peak, idx = pl.pallas_call(
        functools.partial(
            _peak_kernel, tile_lags=tile_lags, precision=precision
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_rows, K2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, tile_lags), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_rows, 1), jnp.float32),
            pltpu.VMEM((tile_rows, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * K2 * Lp,
            bytes_accessed=4 * (Rp * K2 + K2 * Lp * (Rp // tile_rows) + 2 * Rp),
            transcendentals=0,
        ),
        interpret=interpret,
    )(cs2, e2, lo, hi)
    return peak[:R, 0], idx[:R, 0]
