"""Continuous-monitoring pipeline: segmented runs + checkpoint/resume.

The reference's long-duration workflow (SURVEY §3.5) is manual: run the
orchestrator per day/segment, persist TSV files (``helpers.py:161``),
accumulate, re-read (``helpers.py:185``) and plot with ``baz_freq_plot``
("Optimized for weeks/months", reference ``plotting.py:1182``).  The
append/restart text files are its de-facto checkpoint/resume mechanism.

`StreamingMonitor` makes that a first-class subsystem:

- a long waveform (or an iterator of chunks) is tiled into fixed segments,
- segments run on the single-chip pipeline or the sharded (time, band) mesh,
- each segment's dense results are persisted in the reference TSV format
  (plus a compact .npz with flags/uncertainties),
- **resume** skips segments whose outputs already exist,
- a NaN-guard masks non-finite solves instead of crashing (the reference's
  joblib path dies on any worker exception, SURVEY §5),
- `read_all` re-assembles everything for the monitoring figure.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from narrow_band_least_squares_tpu.io.stream import ArrayStream
from narrow_band_least_squares_tpu.io.textio import read_txtfile, write_txtfile
from narrow_band_least_squares_tpu.utils.plan import NarrowBandPlan
from narrow_band_least_squares_tpu.utils.timeutils import epoch_to_datenum

logger = logging.getLogger("nbls_tpu.streaming")


def _nan_guard(arr: np.ndarray) -> np.ndarray:
    """Non-finite solves become zeros (masked, not fatal)."""
    return np.where(np.isfinite(arr), arr, 0.0)


@dataclass
class SegmentRecord:
    start_epoch: float
    path_txt: str
    path_npz: str


class StreamingMonitor:
    """Segmented narrow-band monitoring with persistence and resume.

    Args:
        plan: per-segment plan (npts = segment length).
        rij: (2, N) array geometry [km].
        save_dir: directory for per-segment TSV/npz outputs.
        mesh: optional Mesh; when given, segments are processed in
            mesh-sized batches on the sharded pipeline.
    """

    def __init__(
        self,
        plan: NarrowBandPlan,
        rij: np.ndarray,
        save_dir: str,
        freqlist: Sequence[float],
        filter_type: str = "cheby1",
        filter_order: int = 2,
        filter_ripple: float = 0.01,
        alpha: float = 1.0,
        mesh=None,
        max_retries: int = 1,
        dispatch_segments: int = 4,
        **pipe_kwargs,
    ):
        self.plan = plan
        self.freqlist = list(freqlist)
        self.save_dir = save_dir
        self.alpha = alpha
        self.max_retries = max_retries
        os.makedirs(save_dir, exist_ok=True)

        from narrow_band_least_squares_tpu.parallel.mesh import make_mesh
        from narrow_band_least_squares_tpu.parallel.sharded import (
            ShardedNarrowBandPipeline,
        )

        if mesh is None:
            mesh = make_mesh(1, 1)  # single device, same code path
        self.pipe = ShardedNarrowBandPipeline(
            plan, rij, mesh,
            filter_type=filter_type, filter_order=filter_order,
            filter_ripple=filter_ripple, alpha=alpha, **pipe_kwargs,
        )
        # segments per device dispatch: a multiple of the time-shard
        # count >= dispatch_segments.  Bigger batches amortize the
        # per-dispatch host<->device round trips (through a remote
        # tunnel each costs ~20 ms — they, not compute, bound the
        # monitoring loop) at the price of result latency; segments
        # buffer across submit() calls until a batch fills (flush()
        # pads out the remainder).
        nt = mesh.shape["time"]
        self.batch = nt * max(1, -(-int(dispatch_segments) // nt))
        from collections import deque

        self._inflight = deque()   # (device_out | None, x_ext, t0s, real)
        self._backlog: List = []   # [(x_ext_row (C, T_ext), t0)]
        self._futures: List = []
        self._queued: set = set()  # start_epochs submitted, not yet drained
        self._pool = None

    # ------------------------------------------------------------------
    def _seg_name(self, start_epoch: float) -> str:
        return f"nbls_{start_epoch:.0f}"

    def _seg_done(self, start_epoch: float) -> bool:
        return os.path.exists(
            os.path.join(self.save_dir, self._seg_name(start_epoch) + ".txt")
        )

    def segment_starts(self, st: ArrayStream) -> List[Tuple[int, float]]:
        """(sample_offset, start_epoch) of each whole segment in the stream."""
        Tseg = self.plan.npts
        n = st.npts // Tseg
        return [
            (k * Tseg, st.start_epoch + k * Tseg / st.fs) for k in range(n)
        ]

    # ------------------------------------------------------------------
    # Incremental pipeline: submit() keeps the device queue
    # ``dispatch_depth`` super-batches deep (JAX dispatch is
    # asynchronous) and persistence runs on a worker thread, so host I/O
    # and segment feed overlap device compute instead of serializing
    # with it (the round-3 monitor blocked on transfer + persist between
    # every batch and sustained ~1/30th of the raw step throughput).
    # The writer is a single ordered thread and a batch is only
    # persisted after its device result is fully realized, so resume
    # semantics are unchanged.  flush() drains everything and returns
    # the records persisted since the last flush.

    def _writer_pool(self):
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=1)
        return self._pool

    def submit(
        self, st: ArrayStream, resume: bool = True, dispatch_depth: int = 2,
    ) -> int:
        """Queue every (not-yet-done) segment of a stream; returns the
        number of segments queued.  Non-blocking beyond the dispatch-depth
        cap; call `flush` (or `process`) to collect SegmentRecords.
        ``st.data`` is consumed before this call returns (sub-batch
        leftovers are snapshotted), so the caller may reuse its buffer.

        Multi-process (jax.distributed): every process must execute the
        same batches (the step and the final assembly are collectives),
        so the resume scan is decided by process 0 and broadcast; only
        process 0 persists (shared- and per-host-FS safe).
        """
        import jax

        multiproc = jax.process_count() > 1
        starts = self.segment_starts(st)
        mask = np.array(
            [0 if ((resume and self._seg_done(t0)) or t0 in self._queued)
             else 1
             for _, t0 in starts],
            dtype=np.int32,
        )
        if multiproc:
            from jax.experimental import multihost_utils

            mask = np.asarray(multihost_utils.broadcast_one_to_all(mask))
        todo = [s for s, m in zip(starts, mask) if m]
        if not todo:
            return 0
        self._queued.update(t0 for _, t0 in todo)

        # Segments buffer as (stream-data, offset) references until a
        # super-batch fills; the halo-extended batch tensor is cut lazily
        # at dispatch time (_extend_batch), so the host-side halo assembly
        # of batch k+1 overlaps the device compute of batch k instead of
        # serializing ahead of every dispatch.  Halos come from the raw
        # stream (zeros before sample 0), so non-contiguous resume batches
        # stay exact.  The references never outlive THIS call: the
        # sub-batch remainder is snapshotted (pre-extended) before
        # returning, so the caller may freely reuse/mutate its stream
        # buffer between submits.  Every process sees the same todo
        # (broadcast above), so batch boundaries are identical across
        # processes.
        self._backlog.extend((st.data, off, t0) for off, t0 in todo)
        while len(self._backlog) >= self.batch:
            self._dispatch(self._backlog[: self.batch])
            del self._backlog[: self.batch]
            while len(self._inflight) > max(1, int(dispatch_depth)):
                self._drain_oldest()
        refs = [(i, it) for i, it in enumerate(self._backlog)
                if it[1] is not None]
        if refs:
            rows = self._extend_batch([it for _, it in refs])
            for (i, it), row in zip(refs, rows):
                self._backlog[i] = (row, None, it[2])
        return len(todo)

    def _extend_batch(self, items) -> np.ndarray:
        """Cut halo-extended rows for a dispatch batch, vectorized per
        contiguous same-stream run.  Items are (data, offset, t0);
        ``offset is None`` marks an already-extended row (the snapshotted
        sub-batch remainder of a previous submit)."""
        outs = []
        i = 0
        while i < len(items):
            data, off, _ = items[i]
            if off is None:
                outs.append(data[None])
                i += 1
                continue
            j = i
            offs = []
            while (j < len(items) and items[j][0] is data
                   and items[j][1] is not None):
                offs.append(items[j][1])
                j += 1
            outs.append(self.pipe.extend_segments(data, offs))
            i = j
        return outs[0] if len(outs) == 1 else np.concatenate(outs)

    def _dispatch(self, items):
        """One device dispatch of up to `self.batch` buffered segments."""
        real = len(items)
        t0s = [t for _, _, t in items]
        x_ext = self._extend_batch(items)
        if real < self.batch:
            # pad by repeating the last segment; padded outputs dropped
            pad = np.broadcast_to(
                x_ext[-1], (self.batch - real,) + x_ext.shape[1:]
            )
            x_ext = np.concatenate([x_ext, pad])
            t0s = t0s + [t0s[-1]] * (self.batch - real)
        import jax

        if jax.process_count() > 1:
            # collective dispatch must stay symmetric across processes
            dev = self.pipe.run_extended_async(x_ext)
        else:
            try:
                dev = self.pipe.run_extended_async(x_ext)
            except Exception as e:
                logger.warning("segment dispatch failed: %s", e)
                dev = None
        self._inflight.append((dev, x_ext, t0s, real))

    def _drain_oldest(self):
        import jax

        writer = jax.process_index() == 0
        dev, x_ext, t0s, real = self._inflight.popleft()
        multiproc = jax.process_count() > 1
        if multiproc:
            # the step is a cross-process collective: a per-process
            # retry would diverge the collective schedules (deadlock);
            # let failures propagate symmetrically on every process
            out = self.pipe.finalize_extended(dev)
        else:
            try:
                if dev is None:
                    raise RuntimeError("dispatch failed")
                out = self.pipe.finalize_extended(dev)
            except Exception as e:
                # async errors surface here; re-run the batch with the
                # synchronous retry loop (per-segment fault tolerance)
                logger.warning(
                    "async segment batch failed (%s); retrying", e
                )
                try:
                    out = self._run_with_retry(
                        lambda: self.pipe.run_extended(x_ext)
                    )
                except Exception:
                    # permanently failed: un-queue so a later submit
                    # retries
                    self._queued.difference_update(t0s[:real])
                    raise
        if writer:
            pool = self._writer_pool()
            for s in range(real):
                self._futures.append(
                    pool.submit(self._persist_and_mark, out, s, t0s[s])
                )
        else:
            # non-writers don't persist; the resume scan is process 0's
            self._queued.difference_update(t0s[:real])

    def flush(self) -> List[SegmentRecord]:
        """Dispatch the backlog remainder, drain in-flight batches, and
        return records since the last flush."""
        if self._backlog:
            self._dispatch(self._backlog)
            self._backlog = []
        while self._inflight:
            self._drain_oldest()
        futs, self._futures = self._futures, []
        done, first_err = [], None
        for f in futs:
            try:
                done.append(f.result())
            except Exception as e:  # keep draining; report the first
                first_err = first_err or e
        if first_err is not None:
            # attach the successfully persisted records so the caller
            # doesn't lose their paths
            first_err.records = done
            raise first_err
        return done

    def process(
        self, st: ArrayStream, resume: bool = True, dispatch_depth: int = 2,
    ) -> List[SegmentRecord]:
        """Run every (not-yet-done) segment of a stream; persist results.

        `submit` + `flush`: overlapped, but blocking until everything of
        THIS stream is persisted (plus anything still queued from prior
        `submit` calls)."""
        self.submit(st, resume=resume, dispatch_depth=dispatch_depth)
        return self.flush()

    def close(self) -> List[SegmentRecord]:
        """Drain everything and stop the writer thread."""
        try:
            return self.flush()
        finally:
            if self._pool is not None:
                self._pool.shutdown(wait=True)
                self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def _run_with_retry(self, fn):
        last = None
        for attempt in range(self.max_retries + 1):
            try:
                return fn()
            except Exception as e:  # pragma: no cover - depends on runtime faults
                logger.warning("segment attempt %d failed: %s", attempt, e)
                last = e
        raise last

    def _persist_and_mark(self, out, s: int, t0: float) -> SegmentRecord:
        """Writer-thread persist; the segment stays in _queued until its
        file exists, so an overlapping re-submit can't duplicate it.
        On failure it is un-queued too — a later submit() retries it
        (no file was produced, so the resume scan re-selects it)."""
        try:
            return self._persist_segment(out, s, t0)
        finally:
            self._queued.discard(t0)

    # ------------------------------------------------------------------
    def _persist_segment(self, out: Dict[str, np.ndarray], s: int,
                         t0: float) -> SegmentRecord:
        """Persist one segment from a sharded batch result dict."""
        plan = self.plan
        width = plan.width
        B = plan.nbands

        def dense(name):
            a = np.zeros((B, width))
            a[:, : plan.max_windows] = _nan_guard(np.asarray(out[name][s]))
            return a

        t_array = np.zeros((B, width))
        for b, wp in enumerate(plan.windows):
            t_array[b, : wp.n_windows] = epoch_to_datenum(
                wp.end_times_epoch(t0, plan.fs)
            )
        flags = np.asarray(out["flags"][s]) if "flags" in out else None
        return self._write(dense("vel"), dense("baz"), dense("mdccm"),
                           dense("sig_tau"), t_array, flags, t0,
                           vel_uncert=dense("vel_uncert"),
                           baz_uncert=dense("baz_uncert"))

    def _write(self, vel, baz, mdccm, sig_tau, t_array, flags,
               t0: float, vel_uncert=None, baz_uncert=None) -> SegmentRecord:
        """Persist one segment: npz sidecar first (atomic), TSV last
        (atomic, io.textio) — the resume scan keys on the .txt, so its
        existence must imply the WHOLE segment is on disk; a process
        dying anywhere in here leaves at most a .tmp file and the
        segment is re-selected on the next submit."""
        name = self._seg_name(t0)
        path_npz = os.path.join(self.save_dir, name + ".npz")
        extra = {}
        if vel_uncert is not None:
            extra = {"vel_uncert": vel_uncert, "baz_uncert": baz_uncert}
        tmp_npz = path_npz + ".tmp.npz"   # np.savez appends .npz to bare tmp
        np.savez_compressed(
            tmp_npz, vel=vel, baz=baz, mdccm=mdccm, sig_tau=sig_tau,
            t=t_array, flags=(flags if flags is not None else np.zeros(0)),
            num_compute=np.asarray(self.plan.num_compute_list), **extra,
        )
        os.replace(tmp_npz, path_npz)
        path_txt = write_txtfile(
            self.save_dir, name, vel, baz, mdccm, t_array,
            self.freqlist, self.plan.num_compute_list,
        )
        return SegmentRecord(t0, path_txt, path_npz)

    # ------------------------------------------------------------------
    def read_all(self, extras: bool = False):
        """Concatenate all persisted segments (sorted by time) into dense
        arrays shaped for `plotting.baz_freq_plot`.

        ``extras=True`` additionally consumes each segment's compact .npz
        sidecar — the quantities the TSV format cannot carry — and returns
        a sixth element, a dict with ``sig_tau`` / ``vel_uncert`` /
        ``baz_uncert`` dense ``(B, width)`` arrays and (LTS runs) the
        ``(B, width, P)`` ``flags`` tensor, all concatenated with the same
        per-band valid-prefix layout as vel/baz (feeds
        `plotting.monitoring_uncertainty_plot`).  Segments persisted by
        older versions without a sidecar contribute NaNs (and all-False
        flags) so timelines stay aligned.
        """
        names = sorted(
            f[:-4] for f in os.listdir(self.save_dir)
            if f.startswith("nbls_") and f.endswith(".txt")
        )
        if not names:
            raise FileNotFoundError(f"no segments persisted in {self.save_dir}")
        segs = [read_txtfile(self.save_dir, n) for n in names]
        nums = np.stack([np.asarray(s[5]) for s in segs])   # (nseg, B)
        num_total = nums.sum(axis=0)
        B = segs[0][0].shape[0]
        width = int(num_total.max())
        vel, baz, mdccm, t = (np.zeros((B, width)) for _ in range(4))
        for b in range(B):
            pos = 0
            for si, s in enumerate(segs):
                n_seg = int(nums[si, b])
                for dst, src in ((vel, s[0]), (baz, s[1]), (mdccm, s[2]), (t, s[3])):
                    dst[b, pos : pos + n_seg] = src[b, :n_seg]
                pos += n_seg
        num_list = [int(v) for v in num_total]
        if not extras:
            return vel, baz, mdccm, t, num_list

        # materialize each sidecar's arrays ONCE (NpzFile decompresses on
        # every __getitem__, so indexing inside the per-band loop would be
        # O(B x nseg) full decompressions) and close the handles
        zs = []
        for n in names:
            p = os.path.join(self.save_dir, n + ".npz")
            if not os.path.exists(p):
                logger.warning("segment %s has no .npz sidecar; extras "
                               "filled with NaN", n)
                zs.append(None)
                continue
            with np.load(p, allow_pickle=False) as z:
                zs.append({
                    k: z[k] for k in
                    ("sig_tau", "vel_uncert", "baz_uncert", "flags")
                    if k in z
                })
        sig_tau, vel_uncert, baz_uncert = (
            np.full((B, width), np.nan) for _ in range(3)
        )
        P = 0
        for z in zs:
            f = None if z is None else z.get("flags")
            if f is not None and f.ndim == 3:
                P = int(f.shape[-1])
                break
        flags = np.zeros((B, width, P), dtype=bool) if P else None
        for b in range(B):
            pos = 0
            for si, z in enumerate(zs):
                n_seg = int(nums[si, b])
                if z is not None:
                    if "sig_tau" in z:
                        sig_tau[b, pos : pos + n_seg] = z["sig_tau"][b, :n_seg]
                    if "vel_uncert" in z:
                        vel_uncert[b, pos : pos + n_seg] = (
                            z["vel_uncert"][b, :n_seg]
                        )
                        baz_uncert[b, pos : pos + n_seg] = (
                            z["baz_uncert"][b, :n_seg]
                        )
                    f = z.get("flags")
                    if flags is not None and f is not None and f.ndim == 3:
                        flags[b, pos : pos + n_seg] = f[b, :n_seg].astype(bool)
                pos += n_seg
        ex = {"sig_tau": sig_tau, "vel_uncert": vel_uncert,
              "baz_uncert": baz_uncert}
        if flags is not None:
            ex["flags"] = flags
        return vel, baz, mdccm, t, num_list, ex
