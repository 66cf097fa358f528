"""Two-process ``jax.distributed`` smoke test (CPU backend).

Validates the multi-host story end to end (VERDICT round-1 gap; SURVEY
§2.3/§5 "Distributed backend"): each process contributes 2 CPU devices, the
(time=4, band=1) mesh lays segments across BOTH processes, and the IIR
warm-up halo ``ppermute`` crosses the process boundary (device 1 on process
0 -> device 2 on process 1).  The sharded result must match the unsharded
sequential oracle computed locally on each process.

Run one worker per process (the test harness spawns both):

    python benchmarks/multihost_smoke.py --process-id 0 --num-processes 2 \
        --coordinator localhost:9876 &
    python benchmarks/multihost_smoke.py --process-id 1 --num-processes 2 \
        --coordinator localhost:9876

For a real TPU pod slice, see scripts/launch_pod_slice.sh — the only
difference is ``initialize_distributed(auto=True)`` (TPU metadata supplies
coordinator/process ids) and no forced-CPU config.
"""

from __future__ import annotations

import argparse
import sys


def run_monitor(args, st, plan, rij, mesh, freqlist, nt, nb) -> int:
    """StreamingMonitor persist + resume across the process-sharded mesh.

    Every process executes the same batches (the monitor broadcasts the
    resume scan from process 0 and the final assembly all-gathers); only
    process 0 persists.  Validates VERDICT r3 item 7: monitor
    persist/resume across process boundaries.
    """
    import os

    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    from narrow_band_least_squares_tpu.models.streaming import StreamingMonitor

    writer = jax.process_index() == 0
    mon = StreamingMonitor(
        plan, rij, args.monitor_dir, freqlist, alpha=args.alpha, mesh=mesh,
    )
    recs = mon.process(st)
    n_seg = len(mon.segment_starts(st))
    if writer:
        assert len(recs) == n_seg, (len(recs), n_seg)
        files = [f for f in os.listdir(args.monitor_dir)
                 if f.endswith(".txt")]
        assert len(files) == n_seg, files
    else:
        assert recs == []
    multihost_utils.sync_global_devices("monitor_pass_1")

    # resume: nothing left to do (every process agrees via the broadcast)
    recs2 = mon.process(st)
    assert recs2 == []
    multihost_utils.sync_global_devices("monitor_resume_noop")

    # delete one segment on the writer; every process must re-run exactly
    # that one batch (divergent local FS views resolved by the broadcast)
    victim = mon.segment_starts(st)[1][1]
    if writer:
        os.remove(os.path.join(
            args.monitor_dir, mon._seg_name(victim) + ".txt"
        ))
    multihost_utils.sync_global_devices("monitor_delete")
    recs3 = mon.process(st)
    if writer:
        assert len(recs3) == 1 and abs(recs3[0].start_epoch - victim) < 1e-6
        vel, baz, mdccm, t, num = mon.read_all()
        good = mdccm > 0.6
        assert good.sum() > 0
        d = np.abs((baz[good] - 250.0 + 180.0) % 360.0 - 180.0)
        assert np.median(d) < 5.0, f"baz err {np.median(d)}"
    print(
        f"MULTIHOST_SMOKE_OK process={args.process_id}/{args.num_processes} "
        f"devices={len(jax.devices())} mesh=({nt}x{nb}) "
        f"alpha={args.alpha} monitor segments={n_seg}",
        flush=True,
    )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default="localhost:9876")
    ap.add_argument("--devices-per-process", type=int, default=2)
    ap.add_argument("--mesh-time", type=int, default=0,
                    help="time-shard count (0 = all global devices)")
    ap.add_argument("--mesh-band", type=int, default=1,
                    help="band-shard count (>1 exercises the slot-bucket "
                         "program across the process boundary)")
    ap.add_argument("--alpha", type=float, default=1.0,
                    help="1.0 = OLS; <1 runs the robust LTS solver and "
                         "asserts flag parity across the cluster")
    ap.add_argument("--monitor-dir", default="",
                    help="run StreamingMonitor persist/resume over the "
                         "process-sharded mesh into this directory "
                         "(VERDICT r3 item 7)")
    args = ap.parse_args()

    # Force the CPU backend BEFORE any device use (the axon TPU plugin
    # overrides JAX_PLATFORMS, so the config call is required).
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices_per_process)

    import numpy as np

    from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
    from narrow_band_least_squares_tpu.parallel import (
        ShardedNarrowBandPipeline,
        initialize_distributed,
        make_mesh,
    )
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist,
        get_winlenlist,
        make_plan,
    )

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    n_global = args.num_processes * args.devices_per_process
    assert len(jax.devices()) == n_global, (
        f"expected {n_global} global devices, got {len(jax.devices())}"
    )
    assert len(jax.local_devices()) == args.devices_per_process

    nt = args.mesh_time or (n_global // args.mesh_band)
    nb = args.mesh_band
    assert nt * nb == n_global, (nt, nb, n_global)

    # identical input on every process (single-controller-style SPMD)
    fs = 10.0
    seg_s = 120.0
    st = synthetic_plane_wave(
        nchans=4, duration_s=seg_s * max(nt, 2), fs=fs, baz_deg=250.0,
        trace_vel_kms=0.32, f0=0.6, bandwidth=0.8, snr=10.0, seed=77,
        outlier_channels=(1,) if args.alpha < 1.0 else (),
    )
    freqlist, nbands, _ = get_freqlist(0.3, 1.5, "log", 2 * max(nb, 1))
    winlens = get_winlenlist("adaptive", nbands, 20, 25, 15)
    plan = make_plan(freqlist, "log", winlens, 0.5, int(seg_s * fs), fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)

    # the time axis spans devices of different processes -> the halo
    # ppermute crosses the process boundary; nb > 1 additionally splits the
    # band-sharded slot-bucket constants across processes
    mesh = make_mesh(nt, nb)

    if args.monitor_dir:
        return run_monitor(args, st, plan, rij, mesh, freqlist, nt, nb)

    pipe = ShardedNarrowBandPipeline(
        plan, rij, mesh, filter_type="cheby1", alpha=args.alpha,
    )
    assert pipe.halo > 0, "causal filter must require a halo"
    segs = pipe.segment_stream(st.data)
    out = pipe.run(segs)

    seq = pipe.run_reference_sequential(segs)
    keys = ["vel", "baz", "mdccm", "sig_tau"]
    for k in keys:
        np.testing.assert_allclose(
            out[k], seq[k], rtol=1e-5, atol=1e-5,
            err_msg=f"{k}: sharded({args.num_processes}-process) != sequential",
        )
    if args.alpha < 1.0:
        assert "flags" in out
        nmis = int((out["flags"] != seq["flags"]).sum())
        assert nmis == 0, f"flags: {nmis} mismatches vs sequential"
        # the injected outlier element (1-based: 2) must dominate the flags
        pairs = pipe.base.pairs_np
        per_pair = out["flags"].reshape(-1, pairs.shape[0]).sum(axis=0)
        el_counts = np.zeros(st.nchans)
        for p, (i, j) in enumerate(pairs):
            el_counts[i] += per_pair[p]
            el_counts[j] += per_pair[p]
        # a flagged pair increments both endpoints, so the outlier's
        # most-frequent partner can tie it — assert joint-max membership
        assert el_counts[1] == el_counts.max(), f"flag counts {el_counts}"

    # physical sanity: recovered back-azimuth near the synthetic truth
    good = out["mdccm"] > 0.6
    assert good.sum() > 0
    d = np.abs((out["baz"][good] - 250.0 + 180.0) % 360.0 - 180.0)
    assert np.median(d) < 5.0, f"baz off: median err {np.median(d)} deg"

    print(
        f"MULTIHOST_SMOKE_OK process={args.process_id}/{args.num_processes} "
        f"devices={n_global} mesh=({nt}x{nb}) alpha={args.alpha} "
        f"segments={segs.shape[0]} halo={pipe.halo}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
