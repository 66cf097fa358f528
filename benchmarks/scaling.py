"""Weak-scaling harness: windows/s/device over a growing (time, band) mesh.

BASELINE north star: >=0.9 scaling efficiency at 4 hosts with time-segment +
band sharding.  Round-2 redesign (VERDICT r1 item 4):

- **Weak scaling, constant per-device work.**  The time axis grows the
  segment count with the shard count (`SEGS_PER_SHARD` segments per shard of
  the canonical 8-band plan); the band axis grows the *total* band count
  with the shard count (8 equal-winlen bands per shard), so every shard
  always processes an identical compute block.
- **Inputs pre-sharded outside the timed region** (`jax.device_put` with the
  mesh sharding, then the jitted step is called on resident global arrays).
- **Metric: windows/s/device**; efficiency = rate(n)/rate(1) on the same
  axis.

On real multi-chip hardware run per-host under ``jax.distributed``; on a
single-chip/CPU machine it runs over virtual devices (functional check —
virtual CPU "devices" share physical cores, so parallel speedup is
*impossible* by construction there and the report labels the numbers
accordingly).

``--arrays-saturation`` instead measures single-device throughput vs the
multi-array batch size (the "windows/s at 1 chip" BASELINE measurement
point): how far one chip is from saturated when fed 1..8 arrays at once.

Usage:
    python benchmarks/scaling.py [--devices 8] [--virtual] [--axis both]
    python benchmarks/scaling.py --arrays-saturation
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEGS_PER_SHARD = 2
BANDS_PER_SHARD = 8


def _timed(fn, reps=3, iters=10):
    """Per-step time with dispatch latency amortized: enqueue ``iters``
    async dispatches, block once (never benchmark single dispatches — the
    tunnel adds ~20 ms per round trip)."""
    import jax

    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def bench_axis(axis, counts, devices, seg_s, alpha, fs=20.0):
    """One weak-scaling sweep along 'time' or 'band'."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
    from narrow_band_least_squares_tpu.parallel import (
        ShardedNarrowBandPipeline, make_mesh,
    )
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    Tseg = int(seg_s * fs)
    rows = []
    for n in counts:
        if axis == "time":
            nt, nb = n, 1
            nbands = BANDS_PER_SHARD
            winlens = get_winlenlist("adaptive", nbands, 50, 60, 30)
        else:
            nt, nb = 1, n
            nbands = BANDS_PER_SHARD * n
            # equal window length per band -> identical work per band shard
            winlens = get_winlenlist("constant", nbands, 30, 0, 0)
        freqlist, nbands, _ = get_freqlist(0.1, 5.0, "log", nbands)
        plan = make_plan(freqlist, "log", winlens, 0.5, Tseg, fs)
        S = SEGS_PER_SHARD * nt

        st = synthetic_plane_wave(
            nchans=8, duration_s=seg_s * S, fs=fs,
            baz_deg=230.0, trace_vel_kms=0.34, seed=42,
        )
        rij = get_rij(st.latitudes, st.longitudes, st.nchans)
        mesh = make_mesh(nt, nb, devices[:n])
        pipe = ShardedNarrowBandPipeline(
            plan, rij, mesh, filter_type="cheby1", alpha=alpha,
        )
        segs = pipe.segment_stream(st.data)
        # pre-shard OUTSIDE the timed region
        x = jax.device_put(
            np.asarray(segs, dtype=np.float32),
            NamedSharding(mesh, P("time", None, None)),
        )
        dt = _timed(lambda: pipe._step(x, pipe._consts))
        windows_total = sum(plan.num_compute_list) * S
        rate = windows_total / dt
        rows.append({
            "devices": n, "mesh": [nt, nb], "segments": S,
            "bands_total": plan.nbands,
            "windows_total": windows_total,
            "step_s": dt,
            "windows_per_s": rate,
            "windows_per_s_per_device": rate / n,
        })
        print(
            f"axis={axis} devices={n} mesh=({nt},{nb}) "
            f"windows/s/device={rate / n:,.0f}",
            flush=True,
        )
    base = rows[0]["windows_per_s_per_device"]
    virtual = devices[0].platform == "cpu"
    for r in rows:
        r["efficiency"] = r["windows_per_s_per_device"] / base
        if virtual:
            # Virtual devices share physical cores: n shards do n x total
            # work on the same silicon, so the *expected* efficiency is
            # ~1/n and the informative signal is total throughput staying
            # flat (efficiency x n ~ 1) — any drop below that is real
            # overhead (communication / re-layout), which IS measurable
            # on a virtual mesh.
            r["total_throughput_vs_1dev"] = r["efficiency"] * r["devices"]
    return rows


def bench_arrays_saturation(seg_s, alpha, fs=20.0, batches=(1, 2, 4, 8)):
    """Single-device throughput vs multi-array batch size."""
    import jax
    import numpy as np

    from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
    from narrow_band_least_squares_tpu.models.multiarray import MultiArrayPipeline
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    freqlist, nbands, _ = get_freqlist(0.1, 5.0, "log", BANDS_PER_SHARD)
    winlens = get_winlenlist("adaptive", nbands, 50, 60, 30)
    plan = make_plan(freqlist, "log", winlens, 0.5, int(seg_s * fs), fs)
    rows = []
    for A in batches:
        streams = [
            synthetic_plane_wave(
                nchans=8, duration_s=seg_s, fs=fs,
                baz_deg=200.0 + 10 * k, trace_vel_kms=0.34, seed=42 + k,
            )
            for k in range(A)
        ]
        rijs = [get_rij(s.latitudes, s.longitudes, s.nchans) for s in streams]
        pipe = MultiArrayPipeline(plan, rijs, alpha=alpha)
        data = np.stack([s.data for s in streams]).astype(np.float32)
        args = [jax.device_put(data), pipe._X, pipe._pinv, pipe._XtX_inv]
        if alpha < 1.0:
            args += [pipe._cand, pipe._Ainv, pipe._ok]
        dt = _timed(lambda: pipe._step(*args))
        windows = sum(plan.num_compute_list) * A
        rows.append({
            "arrays": A, "step_s": dt,
            "windows_per_s": windows / dt,
        })
        print(f"arrays={A} windows/s={windows / dt:,.0f}", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="max devices to scale to (0 = all available)")
    ap.add_argument("--segment-s", type=float, default=600.0)
    ap.add_argument("--virtual", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--axis", choices=["time", "band", "both"], default="both")
    ap.add_argument("--arrays-saturation", action="store_true")
    ap.add_argument("--out", default="BENCH_SCALING.json")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    devices = jax.devices()
    virtual = devices[0].platform == "cpu"
    report = {
        "mode": (
            "virtual-cpu (functional check only: virtual devices share "
            "physical cores, linear scaling is impossible by construction)"
            if virtual else "hardware"
        ),
        "design": "weak scaling, constant work per device, inputs pre-sharded",
        "alpha": args.alpha,
        "device_kind": devices[0].device_kind,
    }

    if args.arrays_saturation:
        report["arrays_saturation"] = bench_arrays_saturation(
            args.segment_s, args.alpha
        )
    else:
        n_max = min(args.devices or len(devices), len(devices))
        counts = []
        n = 1
        while n <= n_max:
            counts.append(n)
            n *= 2
        if args.axis in ("time", "both"):
            report["time_axis"] = bench_axis(
                "time", counts, devices, args.segment_s, args.alpha
            )
        if args.axis in ("band", "both"):
            report["band_axis"] = bench_axis(
                "band", counts, devices, args.segment_s, args.alpha
            )

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "design"},
                     default=str)[:400])


if __name__ == "__main__":
    main()
