"""Multi-array batch processing: many infrasound arrays per device step.

BASELINE config "Multi-array batch: 8-16 arrays processed concurrently,
arrays+bands sharded across a single host's chips".  Arrays are fully
independent, so the array axis is either a vmap batch (single chip) or a
mesh data axis (the 'time' axis doubles as the data-parallel axis — both
are zero-communication shardings of independent work).

Constraint: one compiled executable covers arrays with the same element
count and plan; arrays share the band/window plan but each has its own
geometry, so the co-array constants become batched inputs instead of
closure constants.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
from narrow_band_least_squares_tpu.ops import filters as F
from narrow_band_least_squares_tpu.ops import lts as LTS
from narrow_band_least_squares_tpu.ops import solve as SOLVE
from narrow_band_least_squares_tpu.parallel.mesh import TIME_AXIS
from narrow_band_least_squares_tpu.utils.geometry import coarray
from narrow_band_least_squares_tpu.utils.plan import NarrowBandPlan


class MultiArrayPipeline:
    """Process A arrays of identical element count in one device step.

    Args:
        plan: shared band/window plan.
        rij_list: per-array (2, N) geometries (same N across arrays).
        mesh: optional Mesh; arrays shard over its 'time' axis (pure data
            parallelism — no communication).
    """

    def __init__(
        self,
        plan: NarrowBandPlan,
        rij_list: Sequence[np.ndarray],
        filter_type: str = "cheby1",
        filter_order: int = 2,
        filter_ripple: float = 0.01,
        alpha: float = 1.0,
        dtype=jnp.float32,
        c_steps: int = 4,
        mesh=None,
        merge_chunk_arrays: int = 2,
        **base_kwargs,
    ):
        """``base_kwargs`` forwards the single-chip performance options
        (xcorr_method, window_method, max_lag_s, bucket_bands,
        lts_funnel_k, ...) to the underlying `NarrowBandPipeline`.

        ``merge_chunk_arrays`` caps how many arrays are merged into one
        xcorr window batch.  One fully-merged (B, A*W, ...) program hits an
        XLA tiling cliff on v5e above ~4 arrays (delays stage 9.9 ms @ A=4
        -> 50.7 ms @ A=8, achieved HBM bandwidth 615 -> 260 GB/s, temp
        memory 3.1x instead of 2x); chunking the merge into slices of <=2
        arrays inside the same jit restores roofline throughput (50.6 ->
        14.2 ms @ A=8, see benchmarks/diag_arrays2.py).  0 or None merges
        everything (the pre-fix behavior)."""
        nchans = {r.shape[1] for r in rij_list}
        if len(nchans) != 1:
            raise ValueError(
                f"all arrays must have the same element count, got {nchans}"
            )
        self.nchans = nchans.pop()
        self.A = len(rij_list)
        self.alpha = float(alpha)
        self.mesh = mesh
        self.dtype = dtype
        self.merge_chunk_arrays = int(merge_chunk_arrays or self.A)

        # base pipeline provides the shared (non-geometry) host constants
        # AND the optimized extract->xcorr front half (base._delays)
        self.base = NarrowBandPipeline(
            plan, rij_list[0],
            filter_type=filter_type, filter_order=filter_order,
            filter_ripple=filter_ripple, alpha=alpha, dtype=dtype,
            c_steps=c_steps, **base_kwargs,
        )
        self.plan = plan

        # batched geometry constants (A, ...)
        Xs, pinvs, XtXis = [], [], []
        cands, Ainvs, oks = [], [], []
        for rij in rij_list:
            X, pairs = coarray(np.asarray(rij))
            lsq = SOLVE.precompute_lstsq(X)
            Xs.append(X)
            pinvs.append(lsq["pinv"])
            XtXis.append(lsq["XtX_inv"])
            if alpha < 1.0:
                # same candidate policy as the base pipeline (which also
                # auto-sets lts_candidate_chunk when the full enumeration
                # is large; base.lts_candidate_chunk is read at solve
                # time, so the bound applies here too)
                ci = LTS.precompute_candidates(
                    X, max_candidates=base_kwargs.get(
                        "max_lts_candidates", 0
                    ),
                )
                cands.append(ci["cand"])
                Ainvs.append(ci["Ainv"])
                oks.append(ci["ok"])
        self._X = jnp.asarray(np.stack(Xs), dtype)
        self._pinv = jnp.asarray(np.stack(pinvs), dtype)
        self._XtX_inv = jnp.asarray(np.stack(XtXis), dtype)
        if alpha < 1.0:
            self._cand = jnp.asarray(np.stack(cands))
            self._Ainv = jnp.asarray(np.stack(Ainvs), dtype)
            self._ok = jnp.asarray(np.stack(oks))
            self.h = LTS.lts_h(alpha, Xs[0].shape[0])

        self._step = jax.jit(self._build())

    def _build(self):
        base = self.base
        plan = self.plan
        alpha = self.alpha

        def solve_one(tau, mdccm, X, pinv, XtX_inv, *lts_consts):
            if alpha == 1.0:
                out = SOLVE.ols_solve(tau, X, pinv, XtX_inv)
                retained = None
            else:
                cand, Ainv, ok = lts_consts
                out = LTS.lts_solve(
                    tau, X, cand, Ainv, ok, self.h, base.c_steps,
                    candidate_chunk=base.lts_candidate_chunk,
                    funnel_k=base.lts_funnel_k,
                )
                retained = out["retained"]
            wm = base._win_mask
            res = {
                k: jnp.where(wm, out[k], 0.0)
                for k in ("vel", "baz", "sig_tau", "vel_uncert", "baz_uncert")
            }
            res["mdccm"] = jnp.where(wm, mdccm, 0.0)
            if retained is not None:
                res["flags"] = (~retained) & wm[..., None]
            return res

        def step(x_all, X, pinv, XtX_inv, *lts_consts):
            # per-array filtering (cheap), then the xcorr front half runs
            # ONCE with the array axis merged into the window axis — one
            # large MXU batch instead of A vmapped programs (vmap measured
            # 75k -> 31k windows/s going 2 -> 8 arrays on v5e)
            y = jax.vmap(
                lambda x: F.filter_bank_fft(
                    x, base._h_bank, base._taper, base.nfft_filter,
                    base.zerophase,
                )
            )(x_all)
            # chunking slices the array axis, which is the sharded axis in
            # the mesh case — there each device already holds a small local
            # block, so the single-device tiling cliff doesn't apply and
            # slicing would only force cross-shard re-layouts.
            ca = self.merge_chunk_arrays if self.mesh is None else self.A
            # stage-boundary optimization barriers, mirroring
            # NarrowBandPipeline._core: keep filter / delays / solve in
            # separate fusion islands so numerics match the single-array
            # program bitwise (merged==individual parity)
            y = jax.lax.optimization_barrier(y)
            outs = [
                base._delays_batched(y[i:i + ca])
                for i in range(0, self.A, ca)
            ]
            tau, rho, mdccm = jax.lax.optimization_barrier(
                outs[0] if len(outs) == 1
                else tuple(jnp.concatenate(p, axis=0) for p in zip(*outs))
            )
            in_axes = (0, 0) + (0,) * (3 + len(lts_consts))
            return jax.vmap(solve_one, in_axes=in_axes)(
                tau, mdccm, X, pinv, XtX_inv, *lts_consts
            )

        return step

    # ------------------------------------------------------------------
    def run_raw(self, data: np.ndarray) -> Dict[str, jnp.ndarray]:
        """data: (A, C, T) -> dict of (A, B, Wmax[, P]) device arrays."""
        x = np.asarray(data, dtype=np.dtype(self.dtype))
        if x.shape[0] != self.A:
            raise ValueError(f"expected {self.A} arrays, got {x.shape[0]}")
        args = [x, self._X, self._pinv, self._XtX_inv]
        if self.alpha < 1.0:
            args += [self._cand, self._Ainv, self._ok]
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(TIME_AXIS))
            args[0] = jax.device_put(
                x, NamedSharding(self.mesh, P(TIME_AXIS, None, None))
            )
            args[1] = jax.device_put(
                self._X, NamedSharding(self.mesh, P(TIME_AXIS, None, None))
            )
            args[2] = jax.device_put(
                self._pinv, NamedSharding(self.mesh, P(TIME_AXIS, None, None))
            )
            args[3] = jax.device_put(
                self._XtX_inv, NamedSharding(self.mesh, P(TIME_AXIS, None, None))
            )
            if self.alpha < 1.0:
                for i, a in ((4, self._cand), (5, self._Ainv), (6, self._ok)):
                    spec = P(*([TIME_AXIS] + [None] * (a.ndim - 1)))
                    args[i] = jax.device_put(a, NamedSharding(self.mesh, spec))
        return self._step(*args)
