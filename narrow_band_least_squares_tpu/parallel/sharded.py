"""Sharded narrow-band pipeline: time segments x bands over a device mesh.

The scaling story (SURVEY §2.3/§5 and BASELINE north star):

- **Band axis**: embarrassingly parallel (the reference used a joblib process
  per band).  Sharded with zero communication — each device holds its slice
  of the filter bank, window grid and lag masks.
- **Time axis**: a long waveform is tiled into equal segments; each segment
  is processed like one reference run.  The IIR filter needs warm-up state
  across the cut, so each shard sends the tail (one impulse length) of its
  last segment to its right neighbor via ``lax.ppermute`` — the halo rides
  ICI within a host and DCN across hosts, and is the *only* communication in
  the whole computation.  Device 0's first segment gets a zero halo, i.e. the
  cold start every reference run has.

Window grids restart per segment (exactly the reference's chunked
weeks/months workflow, SURVEY §3.5) so no window straddles a segment cut.
Results come back as dense ``(S, B, Wmax)`` arrays sharded
``P('time', 'band', None)``; assembly to host is the final all-gather.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
from narrow_band_least_squares_tpu.ops import filters as F
from narrow_band_least_squares_tpu.ops import lts as LTS
from narrow_band_least_squares_tpu.ops import solve as SOLVE
from narrow_band_least_squares_tpu.ops import xcorr as XC
from narrow_band_least_squares_tpu.ops.windows import extract_windows
from narrow_band_least_squares_tpu.parallel.mesh import BAND_AXIS, TIME_AXIS
from narrow_band_least_squares_tpu.utils.plan import NarrowBandPlan


class ShardedNarrowBandPipeline:
    """Multi-device (and multi-host) narrow-band processing.

    Args:
        plan: per-*segment* plan (npts = segment length in samples).
        rij: (2, N) element coordinates [km].
        mesh: a Mesh with ("time", "band") axes (parallel.mesh.make_mesh).
        halo: left-halo samples for IIR continuity across segment cuts;
            defaults to the filter-bank impulse length (exact warm-up) for
            causal filters and 0 for zero-phase.
    """

    def __init__(
        self,
        plan: NarrowBandPlan,
        rij: np.ndarray,
        mesh: Mesh,
        filter_type: str = "cheby1",
        filter_order: int = 2,
        filter_ripple: float = 0.01,
        alpha: float = 1.0,
        dtype=jnp.float32,
        c_steps: int = 4,
        halo: Optional[int] = None,
    ):
        self.mesh = mesh
        self.nt = mesh.shape[TIME_AXIS]
        self.nb = mesh.shape[BAND_AXIS]
        if plan.nbands % self.nb != 0:
            raise ValueError(
                f"{plan.nbands} bands not divisible by band shards {self.nb}"
            )

        # Reuse the single-device pipeline's host precomputation (jit in it
        # is lazy, so constructing one costs only the host setup).
        base = NarrowBandPipeline(
            plan, rij,
            filter_type=filter_type, filter_order=filter_order,
            filter_ripple=filter_ripple, alpha=alpha,
            apply_filter=True, dtype=dtype, c_steps=c_steps,
        )
        self.base = base
        self.plan = plan
        self.alpha = float(alpha)
        self.dtype = dtype

        L = base._h_bank.shape[1]
        if halo is None:
            halo = 0 if base.zerophase else int(L)
        self.halo = int(halo)
        self.T_ext = plan.npts + self.halo
        self.nfft_ext = F.next_pow2(self.T_ext + L)

        self._consts_banded = (
            base._h_bank, base._idx, base._win_mask, base._len_mask,
            base._lengths, base._lag_mask,
        )
        self._step = jax.jit(self._build_sharded_step())
        self._step_ext = jax.jit(self._build_sharded_step_extended())
        self._seg_step_jit = jax.jit(
            jax.vmap(
                self._build_segment_step(),
                in_axes=(0, None, None, None, None, None, None),
            )
        )

    # ------------------------------------------------------------------
    def _build_segment_step(self):
        """Per-segment compute on a halo-extended block (pure function).

        Takes (x_ext (C, halo+Tseg), h_bank, idx, win_mask, len_mask,
        lengths, lag_mask) so the banded constants can be sharded when
        called under shard_map, and closed-over replicated solver constants.
        """
        base = self.base
        plan = self.plan
        halo = self.halo
        nfft_ext = self.nfft_ext
        alpha = self.alpha

        def seg_step(x_ext, h_bank, idx, win_mask, len_mask, lengths, lag_mask):
            y = F.filter_bank_fft(x_ext, h_bank, None, nfft_ext, base.zerophase)
            y = y[..., halo:] * base._taper[None, None, :]
            # gather-based extraction: the index tensor is band-sharded, so
            # one compiled program serves every band shard (the strided
            # per-band reshape specialization cannot — each shard would need
            # different static hops)
            win = extract_windows(y, idx, len_mask, lengths)
            if base.xcorr_method == "mxu":
                tau, rho, mdccm = XC.cross_correlate_mxu(
                    win, base._pairs, lag_mask, base._dft_tables, plan.fs
                )
            else:
                tau, rho, mdccm = XC.cross_correlate(
                    win, base._pairs, lag_mask, base.nfft_corr, plan.fs
                )
            if alpha == 1.0:
                out = SOLVE.ols_solve(tau, base._X, base._pinv, base._XtX_inv)
                retained = None
            else:
                out = LTS.lts_solve(
                    tau, base._X, base._cand, base._Ainv, base._cand_ok,
                    base.h, base.c_steps,
                    candidate_chunk=base.lts_candidate_chunk,
                )
                retained = out["retained"]
            res = {
                k: jnp.where(win_mask, out[k], 0.0)
                for k in ("vel", "baz", "sig_tau", "vel_uncert", "baz_uncert")
            }
            res["mdccm"] = jnp.where(win_mask, mdccm, 0.0)
            if retained is not None:
                res["flags"] = (~retained) & win_mask[..., None]
            return res

        return seg_step

    def _build_sharded_step(self):
        seg_step = self._build_segment_step()
        halo = self.halo
        Tseg = self.plan.npts
        nt = self.nt
        dtype = self.dtype

        def body(x, h_bank, idx, win_mask, len_mask, lengths, lag_mask):
            # x: (S_loc, C, Tseg) — this shard's contiguous run of segments
            tail = x[..., Tseg - halo:] if halo > 0 else None
            if halo > 0:
                # last local segment's tail -> right neighbor (no wraparound;
                # device 0 receives zeros = cold start)
                perm = [(i, i + 1) for i in range(nt - 1)]
                recv = jax.lax.ppermute(tail[-1], TIME_AXIS, perm)
                tails = jnp.concatenate([recv[None], tail[:-1]], axis=0)
                x_ext = jnp.concatenate([tails, x], axis=-1)
            else:
                x_ext = x
            return jax.vmap(
                lambda xe: seg_step(
                    xe, h_bank, idx, win_mask, len_mask, lengths, lag_mask
                )
            )(x_ext)

        banded2 = P(BAND_AXIS, None)
        in_specs = (
            P(TIME_AXIS, None, None),            # x (S, C, Tseg)
            banded2,                             # h_bank (B, L)
            P(BAND_AXIS, None, None),            # idx
            banded2,                             # win_mask
            P(BAND_AXIS, None, None, None),      # len_mask
            P(BAND_AXIS),                        # lengths
            banded2,                             # lag_mask
        )
        out3 = P(TIME_AXIS, BAND_AXIS, None)
        out_specs = {
            "vel": out3, "baz": out3, "sig_tau": out3,
            "vel_uncert": out3, "baz_uncert": out3, "mdccm": out3,
        }
        if self.alpha < 1.0:
            out_specs["flags"] = P(TIME_AXIS, BAND_AXIS, None, None)

        return shard_map(
            body, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
        )

    def _build_sharded_step_extended(self):
        """Variant consuming host-prepared halo-extended segments.

        Used by the streaming monitor: the host holds the contiguous stream,
        so each segment's left halo is cut from the raw data directly — this
        stays correct for non-contiguous resume batches, where in-mesh
        ppermute chaining would stitch the wrong neighbors together.
        """
        seg_step = self._build_segment_step()

        def body(x_ext, h_bank, idx, win_mask, len_mask, lengths, lag_mask):
            return jax.vmap(
                lambda xe: seg_step(
                    xe, h_bank, idx, win_mask, len_mask, lengths, lag_mask
                )
            )(x_ext)

        banded2 = P(BAND_AXIS, None)
        in_specs = (
            P(TIME_AXIS, None, None),
            banded2,
            P(BAND_AXIS, None, None),
            banded2,
            P(BAND_AXIS, None, None, None),
            P(BAND_AXIS),
            banded2,
        )
        out3 = P(TIME_AXIS, BAND_AXIS, None)
        out_specs = {
            "vel": out3, "baz": out3, "sig_tau": out3,
            "vel_uncert": out3, "baz_uncert": out3, "mdccm": out3,
        }
        if self.alpha < 1.0:
            out_specs["flags"] = P(TIME_AXIS, BAND_AXIS, None, None)
        return shard_map(
            body, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
        )

    def extend_segments(
        self, data: np.ndarray, offsets,
    ) -> np.ndarray:
        """Cut halo-extended segments (S, C, halo+Tseg) at given offsets.

        Halos come from the raw stream itself (zeros before sample 0), so
        any subset of segments — contiguous or not — is processed with the
        exact same warm filter state as a full run.
        """
        C, T = data.shape
        Tseg, halo = self.plan.npts, self.halo
        out = np.zeros((len(offsets), C, halo + Tseg), dtype=np.float32)
        for i, off in enumerate(offsets):
            lo = max(0, off - halo)
            out[i, :, halo - (off - lo):halo] = data[:, lo:off]
            out[i, :, halo:] = data[:, off : off + Tseg]
        return out

    def run_extended(self, x_ext: np.ndarray) -> Dict[str, np.ndarray]:
        """Execute on host-extended segments (S, C, halo+Tseg); S % nt == 0."""
        x = jax.device_put(
            np.asarray(x_ext, dtype=np.dtype(self.dtype)),
            NamedSharding(self.mesh, P(TIME_AXIS, None, None)),
        )
        out = self._step_ext(x, *self._consts_banded)
        return {k: np.asarray(v) for k, v in out.items()}

    # ------------------------------------------------------------------
    def segment_stream(self, data: np.ndarray) -> np.ndarray:
        """(C, T_total) -> (S, C, Tseg); trims the remainder.

        S is rounded down to a multiple of the time-shard count.
        """
        C, T = data.shape
        Tseg = self.plan.npts
        S = (T // Tseg // self.nt) * self.nt
        if S == 0:
            raise ValueError(
                f"stream of {T} samples is shorter than one "
                f"{Tseg}-sample segment per time shard ({self.nt} shards)"
            )
        x = data[:, : S * Tseg].reshape(C, S, Tseg).transpose(1, 0, 2)
        return np.ascontiguousarray(x)

    def run(self, segments: np.ndarray) -> Dict[str, np.ndarray]:
        """Execute on (S, C, Tseg) segments; returns host numpy dict.

        Results: vel/baz/mdccm/sig_tau/... of shape (S, B, Wmax) plus flags
        (S, B, Wmax, P) in LTS mode.
        """
        x = jax.device_put(
            np.asarray(segments, dtype=np.dtype(self.dtype)),
            NamedSharding(self.mesh, P(TIME_AXIS, None, None)),
        )
        out = self._step(x, *self._consts_banded)
        return {k: np.asarray(v) for k, v in out.items()}

    def run_reference_sequential(self, segments: np.ndarray) -> Dict[str, np.ndarray]:
        """Unsharded oracle for the sharded path: same halo chaining, one device.

        Bitwise-comparable to `run` (same kernels, same segment extension),
        used by the sharded==unsharded determinism tests.
        """
        S, C, Tseg = segments.shape
        halo = self.halo
        x_ext = np.zeros((S, C, halo + Tseg), dtype=np.float32)
        for s in range(S):
            if halo > 0 and s > 0:
                x_ext[s, :, :halo] = segments[s - 1][:, Tseg - halo:]
            x_ext[s, :, halo:] = segments[s]
        out = self._seg_step_jit(
            jnp.asarray(x_ext, self.dtype), *self._consts_banded
        )
        return {k: np.asarray(v) for k, v in out.items()}
