"""Sharded narrow-band pipeline: time segments x bands over a device mesh.

The scaling story (SURVEY §2.3/§5 and BASELINE north star):

- **Band axis**: embarrassingly parallel (the reference used a joblib process
  per band, reference ``narrow_band_least_squares.py:285``).  Sharded with
  zero communication — each device holds its slice of the filter bank,
  window grid and lag masks.
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

Per-chip performance matches the single-chip pipeline:

- band-unsharded meshes (``nb == 1``, pure time/data parallelism) reuse the
  base pipeline's full optimized core — strided extraction, per-winlen
  bucketing, lag caps, fast mode, the Pallas kernel — verbatim.
- band-sharded meshes (``nb > 1``) run a **slot-bucketed** variant: bands
  are dealt to shards round-robin in descending window-length order
  ("snake dealing", so shards hold near-equal window lengths at each
  slot), and the *band slots* are bucketed by window length.  SPMD
  requires one program for all shards, so each bucket's static shapes are
  the elementwise max over shards at the same slot — snake dealing keeps
  that max within ~10% of every shard's true size (contiguous dealing
  inflated the xcorr matmuls ~1.4x).  Per-shard masks / lag bounds ride
  in as band-sharded constants.  Window extraction uses the fast strided
  reshapes via ``lax.switch`` on the shard's band-axis index: one SPMD
  program containing nb specialized branches, each with its shard's
  static per-band hops (measured on v5e: the gather fallback alone cost
  ~2x per chip).  ``window_method='gather'`` keeps the old gather path.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
from narrow_band_least_squares_tpu.ops import filters as F
from narrow_band_least_squares_tpu.ops import xcorr as XC
from narrow_band_least_squares_tpu.ops.windows import (
    extract_windows,
    mask_demean,
)
from narrow_band_least_squares_tpu.parallel.mesh import BAND_AXIS, TIME_AXIS
from narrow_band_least_squares_tpu.utils.plan import NarrowBandPlan

logger = logging.getLogger("nbls_tpu")


def _to_host(v) -> np.ndarray:
    """Global device array -> full host numpy, multi-controller safe.

    Single-process: plain `np.asarray`.  Multi-process (jax.distributed):
    the output is sharded across processes, so the non-addressable shards
    are all-gathered first — this is the final assembly step of the whole
    computation (the reference's joblib gather loop,
    ``narrow_band_least_squares.py:291-319``).
    """
    if getattr(v, "is_fully_addressable", True):
        return np.asarray(v)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(v, tiled=True))


class ShardedNarrowBandPipeline:
    """Multi-device (and multi-host) narrow-band processing.

    Args:
        plan: per-*segment* plan (npts = segment length in samples).
        rij: (2, N) element coordinates [km].
        mesh: a Mesh with ("time", "band") axes (parallel.mesh.make_mesh),
            or None with ``mesh_shape`` given — a *virtual* mesh: only the
            single-device oracle path (`run_reference_sequential`) is
            built, which compiles the exact per-chip program an
            (nt, nb) mesh would run.  Used to measure band-sharded
            per-chip cost on hardware with fewer physical devices than
            the target mesh (benchmarks/sharded_perchip.py).
        halo: left-halo samples for IIR continuity across segment cuts;
            defaults to the filter-bank impulse length (exact warm-up) for
            causal filters and 0 for zero-phase.
        Remaining keywords mirror `NarrowBandPipeline` — the single-chip
        performance options (bucketing, lag caps, LTS funnel)
        are plumbed through so the per-chip step cost matches it.
    """

    def __init__(
        self,
        plan: NarrowBandPlan,
        rij: np.ndarray,
        mesh: Optional[Mesh],
        filter_type: str = "cheby1",
        filter_order: int = 2,
        filter_ripple: float = 0.01,
        alpha: float = 1.0,
        dtype=jnp.float32,
        c_steps: int = 4,
        halo: Optional[int] = None,
        xcorr_method: str = "mxu",
        window_method: str = "strided",
        max_lag_s: Optional[float] = None,
        matmul_precision: str = "high",
        lts_candidate_chunk: int = 0,
        lts_funnel_k: int = 0,
        subsample_delays: bool = False,
        bucket_bands: bool = True,
        bucket_ratio: float = 1.3,
        bucket_slack: float = 1.08,
        max_lts_candidates: int = 0,
        xcorr_chunk_mb: float = 16.0,
        xcorr_lag_tile: int = 512,
        band_limit_db=0.0,          # float dB or "auto" (BT-aware)
        mesh_shape: Optional[Tuple[int, int]] = None,
        transfer_dtype=None,        # host->device wire dtype for segment
        #   streams; 'bfloat16' halves the bytes shipped per batch (the
        #   monitoring loop is host->device-bandwidth-bound through a
        #   remote tunnel: ~27-40 MB/s measured on axon, so a 16-segment
        #   6.2 MB float32 batch costs ~230 ms before any compute).  The
        #   device upcasts to `dtype` before filtering, so only the raw
        #   sample quantization (8-bit mantissa, ~0.4% per sample) is
        #   affected — delay estimation averages it out (measured: same
        #   confident-window flags/baz on the monitoring workload,
        #   BENCH_STREAMING.json transfer_bf16).  None = `dtype` (exact).
    ):
        self.mesh = mesh
        if mesh is None:
            if mesh_shape is None:
                raise ValueError("mesh=None requires mesh_shape=(nt, nb)")
            self.nt, self.nb = int(mesh_shape[0]), int(mesh_shape[1])
        else:
            self.nt = mesh.shape[TIME_AXIS]
            self.nb = mesh.shape[BAND_AXIS]
        if plan.nbands % self.nb != 0:
            raise ValueError(
                f"{plan.nbands} bands not divisible by band shards {self.nb}"
            )

        if self.nb > 1:
            # one SPMD program serves every band shard, so per-band static
            # specializations become per-shard `lax.switch` branches
            # (strided extraction) or shard-uniform equivalents (gather)
            if xcorr_method == "pallas":
                logger.warning(
                    "xcorr_method='pallas' is not supported under band "
                    "sharding; falling back to 'mxu'"
                )
                xcorr_method = "mxu"
            if window_method == "patches":
                logger.info(
                    "band-sharded pipeline supports 'strided' (switch "
                    "branches) or 'gather' extraction; using 'strided'"
                )
                window_method = "strided"
        self.bucket_bands = bool(bucket_bands) and xcorr_method in (
            "mxu", "pallas"
        )

        # Reuse the single-device pipeline's host precomputation (jit in it
        # is lazy, so constructing one costs only the host setup).  Under
        # band sharding the slot buckets below replace the base's global
        # buckets, so skip building those.
        base = NarrowBandPipeline(
            plan, rij,
            filter_type=filter_type, filter_order=filter_order,
            filter_ripple=filter_ripple, alpha=alpha,
            apply_filter=True, dtype=dtype, c_steps=c_steps,
            xcorr_method=xcorr_method, window_method=window_method,
            max_lag_s=max_lag_s, matmul_precision=matmul_precision,
            lts_candidate_chunk=lts_candidate_chunk,
            lts_funnel_k=lts_funnel_k, subsample_delays=subsample_delays,
            bucket_bands=(self.bucket_bands and self.nb == 1),
            bucket_ratio=bucket_ratio, bucket_slack=bucket_slack,
            max_lts_candidates=max_lts_candidates,
            xcorr_chunk_mb=xcorr_chunk_mb, xcorr_lag_tile=xcorr_lag_tile,
            band_limit_db=band_limit_db,
        )
        self.base = base
        self._bucket_slack = float(bucket_slack)
        self.plan = plan
        self.alpha = float(alpha)
        self.dtype = dtype
        self.transfer_dtype = np.dtype(
            jnp.bfloat16 if transfer_dtype in ("bfloat16", "bf16")
            else (transfer_dtype or dtype)
        )
        self.max_lag_s = max_lag_s

        L = base._h_bank.shape[1]
        if halo is None:
            halo = 0 if base.zerophase else int(L)
        self.halo = int(halo)
        self.T_ext = plan.npts + self.halo
        self.nfft_ext = F.next_pow2(self.T_ext + L)

        if self.nb == 1:
            self._mode = "core"
        elif self.bucket_bands:
            self._mode = "bucket"
        else:
            self._mode = "global"
        self._shard_extract = window_method

        # band dealing: deal[k, s] = global band of shard k, slot s.
        # Bucket mode deals round-robin in descending window-length order
        # ("snake"), so all shards at a slot have near-equal window lengths
        # and the slot-template (max-over-shards) shapes stay tight.
        B_loc = plan.nbands // self.nb
        if self._mode == "bucket":
            order = np.argsort(
                [-wp.winlensamp for wp in plan.windows], kind="stable"
            )
            self._deal = order.reshape(B_loc, self.nb).T.copy()
        else:
            self._deal = np.arange(plan.nbands).reshape(self.nb, B_loc)
        # device band-axis layout: position k*B_loc+s holds band deal[k,s]
        self._band_perm = self._deal.reshape(-1)
        self._band_inv_perm = np.argsort(self._band_perm)
        self._identity_deal = bool(
            np.array_equal(self._band_perm, np.arange(plan.nbands))
        )

        if self._mode == "bucket":
            max_lag = None
            if max_lag_s is not None:
                max_lag = int(max_lag_s * plan.fs)
            self._build_slot_buckets(bucket_ratio, max_lag)

        self._consts, self._consts_specs = self._build_consts()
        if mesh is not None:
            self._step = jax.jit(self._build_sharded_step())
            self._step_ext_packed = jax.jit(
                self._build_sharded_step_extended_packed()
            )
        self._seg_step_jit = jax.jit(
            jax.vmap(
                self._build_segment_step(nb_factor=self.nb),
                in_axes=(0, None),
            )
        )

    # ------------------------------------------------------------------
    def _build_slot_buckets(self, ratio: float, max_lag: Optional[int]):
        """Bucket the band *slots* by window length.

        Bands are dealt to shards per ``self._deal`` (snake dealing, see
        constructor).  Slot s's template length is the max of
        ``winlensamp`` across shards at that slot, so one static program
        covers every shard; the actual per-band masks/lag bounds ride in
        as band-sharded data with layout ``row = shard*Bg + slot_position``.
        """
        plan, nb = self.plan, self.nb
        B = plan.nbands
        B_loc = B // nb
        deal = self._deal
        lens = np.array([wp.winlensamp for wp in plan.windows])
        nwin = np.array([wp.n_windows for wp in plan.windows])
        slot_len = lens[deal].max(axis=0)          # (B_loc,)
        slot_win = nwin[deal].max(axis=0)

        from narrow_band_least_squares_tpu.ops.windows import bucket_by_cost
        groups = bucket_by_cost(slot_len, slot_win, slack=self._bucket_slack)

        dtype = np.dtype(self.dtype)
        build_idx = self._shard_extract == "gather"
        self._slot_buckets = []
        self._bucket_tables = []
        for slots in groups:
            slots_np = np.asarray(slots, dtype=np.int64)
            Lg = int(slot_len[slots_np].max())
            Wg = int(slot_win[slots_np].max())
            half = Lg - 1 if max_lag is None else min(int(max_lag), Lg - 1)
            nlag = 2 * half + 1
            lags = np.arange(-half, half + 1)
            Bg = len(slots)

            idx = (np.zeros((nb * Bg, Wg, Lg), dtype=np.int32)
                   if build_idx else None)
            len_mask = np.zeros((nb * Bg, Lg), dtype=np.float64)
            lengths = np.zeros((nb * Bg,), dtype=np.int32)
            lag_mask = np.zeros((nb * Bg, nlag), dtype=bool)
            lag_half = np.zeros((nb * Bg,), dtype=np.int32)
            for k in range(nb):
                for gi, s in enumerate(slots_np):
                    b = int(deal[k, int(s)])
                    wp = plan.windows[b]
                    Lb = wp.winlensamp
                    r = k * Bg + gi
                    lengths[r] = Lb
                    len_mask[r, :Lb] = 1.0
                    lag_mask[r] = np.abs(lags) <= (Lb - 1)
                    lag_half[r] = min(Lb - 1, half)
                    if build_idx:
                        for w, s0 in enumerate(wp.starts):
                            idx[r, w, :Lb] = s0 + np.arange(Lb)
                            idx[r, w, Lb:] = s0
            tab = XC.precompute_dft_tables(Lg, dtype, max_lag=half)
            if self.base.band_limit_db:
                from narrow_band_least_squares_tpu.models.narrowband import (
                    band_limit_auto_db,
                )

                bands = sorted(
                    int(deal[k, int(s)]) for k in range(nb) for s in slots_np
                )
                if self.base.band_limit_db == "auto":
                    bts = plan.bt_products()
                    db = band_limit_auto_db(min(bts[b] for b in bands))
                else:
                    db = float(self.base.band_limit_db)
                kmin, kmax = XC.band_limit_bins(
                    self.base.sos_list, bands, tab["nfft"], plan.fs,
                    db, zerophase=self.base.zerophase,
                )
                tab = XC.slice_tables_bins(tab, kmin, kmax)
            self._bucket_tables.append({
                k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                for k, v in tab.items()
            })
            bk = {
                "slots": slots_np,
                "Wg": Wg,
                "Lg": Lg,
                "len_mask": jnp.asarray(
                    len_mask.reshape(nb * Bg, 1, 1, Lg), self.dtype
                ),
                "lengths": jnp.asarray(lengths, self.dtype),
                "lag_mask": jnp.asarray(lag_mask),
                "lag_half": jnp.asarray(lag_half, jnp.int32),
            }
            if build_idx:
                bk["idx"] = jnp.asarray(idx)
            self._slot_buckets.append(bk)

    def _bucket_gathers(self, nb_factor: int) -> Tuple[List[np.ndarray], np.ndarray]:
        """Static band-gather lists + inverse permutation for a given view.

        Rows are positions in the *device* (dealt) band layout, where
        position ``k*B_loc + s`` holds band ``deal[k, s]``.

        ``nb_factor = 1``: the shard-local view (y has B_loc bands).
        ``nb_factor = nb``: the unsharded oracle view (y has all B bands,
        consts arrays used whole, rows laid out shard-major).
        """
        B_loc = self.plan.nbands // self.nb
        gathers, rows_all = [], []
        for bk in self._slot_buckets:
            rows = np.concatenate(
                [k * B_loc + bk["slots"] for k in range(nb_factor)]
            )
            gathers.append(rows.astype(np.int32))
            rows_all.append(rows)
        inv = np.argsort(np.concatenate(rows_all), kind="stable")
        return gathers, inv.astype(np.int32)

    def _bucket_branch(self, g: int, k: int):
        """Strided-extraction branch for shard k, bucket g.

        Returns a function ``y_loc (B_loc, C, T) -> (Bg, Wg, C, Lg)`` raw
        windows for shard k's bands at this bucket's slots, built with
        shard k's static per-band (winlen, hop).  Under SPMD the nb
        branches become one ``lax.switch`` on the band-axis index.
        """
        from narrow_band_least_squares_tpu.ops.windows import _strided_band

        bk = self._slot_buckets[g]
        slots = [int(s) for s in bk["slots"]]
        Wg, Lg = bk["Wg"], bk["Lg"]
        bands = [int(self._deal[k, s]) for s in slots]
        windows = self.plan.windows

        def branch(y_loc):
            return jnp.stack(
                [_strided_band(y_loc[s], windows[bands[i]], Wg, Lg)
                 for i, s in enumerate(slots)],
                axis=0,
            )

        return branch

    # ------------------------------------------------------------------
    def _build_segment_step(self, nb_factor: int):
        """Per-segment compute on a halo-extended block (pure function).

        ``seg_step(x_ext, consts)`` where consts carries every band-sharded
        constant (empty for band-unsharded meshes — the base pipeline's
        closure constants are replicated).  ``nb_factor`` selects the
        shard-local vs whole-band static gather lists (bucket mode only).
        """
        base = self.base
        plan = self.plan
        halo = self.halo
        nfft_ext = self.nfft_ext
        mode = self._mode
        Wmax = plan.max_windows
        nb = self.nb
        B_loc = plan.nbands // nb
        strided = self._shard_extract == "strided"

        if mode == "bucket":
            gathers, inv = self._bucket_gathers(nb_factor)
            tables = self._bucket_tables
            if strided:
                branches = [
                    [self._bucket_branch(g, k) for k in range(nb)]
                    for g in range(len(self._slot_buckets))
                ]

        def seg_step(x_ext, consts):
            # wire dtype (transfer_dtype, e.g. bf16) -> compute dtype
            x_ext = x_ext.astype(base.dtype)
            h_bank = consts["h_bank"] if consts else base._h_bank
            y = F.filter_bank_fft(x_ext, h_bank, None, nfft_ext, base.zerophase)
            y = y[..., halo:] * base._taper[None, None, :]

            if mode == "core":
                # band axis unsharded: the single-chip optimized core
                # (strided extraction, bucketing, pallas, fast mode) applies
                return base._core(y)

            if mode == "bucket":
                taus, mds = [], []
                for g, bk_c in enumerate(consts["buckets"]):
                    if strided and nb_factor == 1:
                        kidx = jax.lax.axis_index(BAND_AXIS)
                        raw = jax.lax.switch(kidx, branches[g], y)
                        win = mask_demean(
                            raw, bk_c["len_mask"], bk_c["lengths"]
                        )
                    elif strided:
                        raw = jnp.concatenate(
                            [branches[g][k](y[k * B_loc:(k + 1) * B_loc])
                             for k in range(nb)],
                            axis=0,
                        )
                        win = mask_demean(
                            raw, bk_c["len_mask"], bk_c["lengths"]
                        )
                    else:
                        yg = y[gathers[g]]
                        win = extract_windows(
                            yg, bk_c["idx"], bk_c["len_mask"],
                            bk_c["lengths"],
                        )
                    tau, rho, md = base._xcorr_mxu_chunked(
                        win, bk_c["lag_mask"], tables[g], bk_c["lag_half"],
                    )
                    pad = Wmax - tau.shape[1]
                    if pad:
                        tau = jnp.pad(tau, ((0, 0), (0, pad), (0, 0)))
                        md = jnp.pad(md, ((0, 0), (0, pad)))
                    taus.append(tau)
                    mds.append(md)
                tau = jnp.concatenate(taus, axis=0)[inv]
                mdccm = jnp.concatenate(mds, axis=0)[inv]
                return base._solve_masked(tau, mdccm, consts["win_mask"])

            # mode == "global": unbucketed gather over the full grid
            win = extract_windows(
                y, consts["idx"], consts["len_mask"], consts["lengths"]
            )
            if base.xcorr_method == "mxu":
                tau, rho, mdccm = base._xcorr_mxu_chunked(
                    win, consts["lag_mask"], base._dft_tables,
                    consts["lag_half"],
                )
            else:
                tau, rho, mdccm = XC.cross_correlate(
                    win, base._pairs, consts["lag_mask"], base.nfft_corr,
                    plan.fs,
                )
            return base._solve_masked(tau, mdccm, consts["win_mask"])

        return seg_step

    def _build_consts(self):
        """Band-sharded constants pytree + matching PartitionSpecs."""
        base = self.base
        if self._mode == "core":
            return {}, {}
        if self._mode == "bucket":
            perm = self._band_perm
            consts = {
                "h_bank": base._h_bank[perm],
                "win_mask": base._win_mask[perm],
                "buckets": tuple(
                    {
                        **({"idx": bk["idx"]} if "idx" in bk else {}),
                        "len_mask": bk["len_mask"],
                        "lengths": bk["lengths"],
                        "lag_mask": bk["lag_mask"],
                        "lag_half": bk["lag_half"],
                    }
                    for bk in self._slot_buckets
                ),
            }
            specs = {
                "h_bank": P(BAND_AXIS, None),
                "win_mask": P(BAND_AXIS, None),
                "buckets": tuple(
                    {
                        **({"idx": P(BAND_AXIS, None, None)}
                           if "idx" in bk else {}),
                        "len_mask": P(BAND_AXIS, None, None, None),
                        "lengths": P(BAND_AXIS),
                        "lag_mask": P(BAND_AXIS, None),
                        "lag_half": P(BAND_AXIS),
                    }
                    for bk in self._slot_buckets
                ),
            }
            return consts, specs
        consts = {
            "h_bank": base._h_bank,
            "win_mask": base._win_mask,
            "idx": base._idx,
            "len_mask": base._len_mask,
            "lengths": base._lengths,
            "lag_mask": base._lag_mask,
            "lag_half": base._lag_half,
        }
        specs = {
            "h_bank": P(BAND_AXIS, None),
            "win_mask": P(BAND_AXIS, None),
            "idx": P(BAND_AXIS, None, None),
            "len_mask": P(BAND_AXIS, None, None, None),
            "lengths": P(BAND_AXIS),
            "lag_mask": P(BAND_AXIS, None),
            "lag_half": P(BAND_AXIS),
        }
        return consts, specs

    def _out_specs(self):
        out3 = P(TIME_AXIS, BAND_AXIS, None)
        out_specs = {
            "vel": out3, "baz": out3, "sig_tau": out3,
            "vel_uncert": out3, "baz_uncert": out3, "mdccm": out3,
        }
        if self.alpha < 1.0:
            out_specs["flags"] = P(TIME_AXIS, BAND_AXIS, None, None)
        return out_specs

    def _build_sharded_step(self):
        seg_step = self._build_segment_step(nb_factor=1)
        halo = self.halo
        Tseg = self.plan.npts
        nt = self.nt

        def body(x, consts):
            # x: (S_loc, C, Tseg) — this shard's contiguous run of segments
            if halo > 0:
                tail = x[..., Tseg - halo:]
                # last local segment's tail -> right neighbor (no wraparound;
                # device 0 receives zeros = cold start)
                perm = [(i, i + 1) for i in range(nt - 1)]
                recv = jax.lax.ppermute(tail[-1], TIME_AXIS, perm)
                tails = jnp.concatenate([recv[None], tail[:-1]], axis=0)
                x_ext = jnp.concatenate([tails, x], axis=-1)
            else:
                x_ext = x
            return jax.vmap(seg_step, in_axes=(0, None))(x_ext, consts)

        in_specs = (P(TIME_AXIS, None, None), self._consts_specs)
        return shard_map(
            body, mesh=self.mesh, in_specs=in_specs,
            out_specs=self._out_specs(),
        )

    def _build_sharded_step_extended(self):
        """Variant consuming host-prepared halo-extended segments.

        Used by the streaming monitor: the host holds the contiguous stream,
        so each segment's left halo is cut from the raw data directly — this
        stays correct for non-contiguous resume batches, where in-mesh
        ppermute chaining would stitch the wrong neighbors together.
        """
        seg_step = self._build_segment_step(nb_factor=1)

        def body(x_ext, consts):
            return jax.vmap(seg_step, in_axes=(0, None))(x_ext, consts)

        in_specs = (P(TIME_AXIS, None, None), self._consts_specs)
        return shard_map(
            body, mesh=self.mesh, in_specs=in_specs,
            out_specs=self._out_specs(),
        )

    # outputs stacked into ONE tensor before leaving the device: through
    # a remote tunnel every fetch is a ~20 ms round trip, and the
    # monitoring path was paying one per output key (6-7 per batch); the
    # packed form is one fetch (+1 for LTS flags)
    _PACK_KEYS = ("vel", "baz", "mdccm", "sig_tau", "vel_uncert",
                  "baz_uncert")

    def _build_sharded_step_extended_packed(self):
        step = self._build_sharded_step_extended()

        def body(x_ext, consts):
            out = step(x_ext, consts)
            res = {"packed": jnp.stack([out[k] for k in self._PACK_KEYS])}
            if "flags" in out:
                res["flags"] = out["flags"]
            return res

        return body

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
        out = np.zeros(
            (len(offsets), C, halo + Tseg), dtype=self.transfer_dtype
        )
        for i, off in enumerate(offsets):
            lo = max(0, off - halo)
            out[i, :, halo - (off - lo):halo] = data[:, lo:off]
            out[i, :, halo:] = data[:, off : off + Tseg]
        return out

    def _unpermute_bands(self, out: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Device (dealt) band layout -> the plan's band order (axis 1)."""
        if self._identity_deal:
            return out
        inv = self._band_inv_perm
        return {k: v[:, inv] for k, v in out.items()}

    def _require_mesh(self):
        if self.mesh is None:
            raise RuntimeError(
                "this pipeline was built with mesh=None (virtual mesh: "
                "host precomputation + run_reference_sequential only); "
                "pass a real jax.sharding.Mesh to execute run()/"
                "run_extended()/StreamingMonitor"
            )

    def run_extended(self, x_ext: np.ndarray) -> Dict[str, np.ndarray]:
        """Execute on host-extended segments (S, C, halo+Tseg); S % nt == 0."""
        return self.finalize_extended(self.run_extended_async(x_ext))

    def run_extended_async(self, x_ext: np.ndarray) -> Dict[str, jnp.ndarray]:
        """Dispatch `run_extended` without blocking on the result.

        Returns the device-array dict (JAX dispatch is asynchronous); call
        `finalize_extended` to block and convert.  Lets a caller overlap
        the next batch's host prep / this batch's persist with device
        compute (models.streaming.StreamingMonitor's double-buffering).
        Outputs ride packed (one stacked tensor) so the host fetch is a
        single transfer.
        """
        self._require_mesh()
        x = jax.device_put(
            np.asarray(x_ext, dtype=self.transfer_dtype),
            NamedSharding(self.mesh, P(TIME_AXIS, None, None)),
        )
        return self._step_ext_packed(x, self._consts)

    def finalize_extended(
        self, out: Dict[str, jnp.ndarray]
    ) -> Dict[str, np.ndarray]:
        """Block on a `run_extended_async` result and convert to host."""
        packed = _to_host(out["packed"])
        res = {k: packed[i] for i, k in enumerate(self._PACK_KEYS)}
        if "flags" in out:
            res["flags"] = _to_host(out["flags"])
        return self._unpermute_bands(res)

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
        self._require_mesh()
        x = jax.device_put(
            np.asarray(segments, dtype=self.transfer_dtype),
            NamedSharding(self.mesh, P(TIME_AXIS, None, None)),
        )
        out = self._step(x, self._consts)
        return self._unpermute_bands({k: _to_host(v) for k, v in out.items()})

    def run_reference_sequential(self, segments: np.ndarray) -> Dict[str, np.ndarray]:
        """Unsharded oracle for the sharded path: same halo chaining, one device.

        Bitwise-comparable to `run` (same kernels, same segment extension,
        same slot-bucket decomposition evaluated whole-band), used by the
        sharded==unsharded determinism tests.
        """
        S, C, Tseg = segments.shape
        halo = self.halo
        x_ext = np.zeros((S, C, halo + Tseg), dtype=np.float32)
        for s in range(S):
            if halo > 0 and s > 0:
                x_ext[s, :, :halo] = segments[s - 1][:, Tseg - halo:]
            x_ext[s, :, halo:] = segments[s]
        out = self._seg_step_jit(jnp.asarray(x_ext, self.dtype), self._consts)
        return self._unpermute_bands({k: np.asarray(v) for k, v in out.items()})
