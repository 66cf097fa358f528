"""Scaling-efficiency harness: windows/s over a growing (time, band) mesh.

BASELINE north star: >=0.9 scaling efficiency at 4 hosts with time-segment +
band sharding.  This harness measures throughput of the sharded pipeline at
1..N devices and reports efficiency vs linear scaling.

On real multi-chip hardware run it as-is (per-host under
``jax.distributed``); on a single-chip or CPU machine it exercises the full
sharded code path over virtual devices (functional validation — virtual CPU
"devices" share cores, so efficiency numbers there are plumbing checks, not
hardware measurements; the harness says which mode it ran in).

Usage:
    python benchmarks/scaling.py [--devices 8] [--segment-s 600] [--virtual]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="max devices to scale to (0 = all available)")
    ap.add_argument("--segment-s", type=float, default=600.0)
    ap.add_argument("--virtual", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    ap.add_argument("--alpha", type=float, default=1.0)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
    from narrow_band_least_squares_tpu.parallel import (
        ShardedNarrowBandPipeline, auto_mesh_shape, make_mesh,
    )
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    devices = jax.devices()
    n_max = args.devices or len(devices)
    n_max = min(n_max, len(devices))
    virtual = devices[0].platform == "cpu"

    fs = 20.0
    st = synthetic_plane_wave(
        nchans=8, duration_s=args.segment_s * 2 * n_max, fs=fs,
        baz_deg=230.0, trace_vel_kms=0.34, seed=42,
    )
    freqlist, nbands, _ = get_freqlist(0.1, 5.0, "log", 8)
    winlens = get_winlenlist("adaptive", nbands, 50, 60, 30)
    plan = make_plan(freqlist, "log", winlens, 0.5, int(args.segment_s * fs), fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    windows_per_seg = sum(plan.num_compute_list)

    results = []
    n = 1
    while n <= n_max:
        nt, nb = auto_mesh_shape(n, nbands=nbands)
        mesh = make_mesh(nt, nb, devices[:n])
        pipe = ShardedNarrowBandPipeline(
            plan, rij, mesh, filter_type="cheby1", alpha=args.alpha,
        )
        segs = pipe.segment_stream(st.data)[: 2 * nt]
        out = pipe.run(segs)  # compile + warm
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = pipe.run(segs)
        dt = (time.perf_counter() - t0) / reps
        thru = windows_per_seg * segs.shape[0] / dt
        results.append({
            "devices": n, "mesh": [nt, nb], "segments": int(segs.shape[0]),
            "windows_per_s": thru,
        })
        print(f"devices={n} mesh=({nt},{nb}) windows/s={thru:,.0f}", flush=True)
        n *= 2

    base = results[0]["windows_per_s"]
    for r in results:
        r["efficiency"] = r["windows_per_s"] / (base * r["devices"])
    report = {
        "mode": "virtual-cpu(plumbing-check)" if virtual else "hardware",
        "alpha": args.alpha,
        "windows_per_segment": windows_per_seg,
        "results": results,
    }
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["results"][-1]))


if __name__ == "__main__":
    main()
