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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default="localhost:9876")
    ap.add_argument("--devices-per-process", type=int, default=2)
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

    # identical input on every process (single-controller-style SPMD)
    fs = 10.0
    seg_s = 120.0
    st = synthetic_plane_wave(
        nchans=4, duration_s=seg_s * n_global, fs=fs, baz_deg=250.0,
        trace_vel_kms=0.32, f0=0.6, bandwidth=0.8, snr=10.0, seed=77,
    )
    freqlist, nbands, _ = get_freqlist(0.3, 1.5, "log", 2)
    winlens = get_winlenlist("adaptive", nbands, 20, 25, 15)
    plan = make_plan(freqlist, "log", winlens, 0.5, int(seg_s * fs), fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)

    # time axis spans all devices of both processes -> the halo ppermute
    # from local device 1 to remote device 2 crosses the process boundary
    mesh = make_mesh(n_global, 1)
    pipe = ShardedNarrowBandPipeline(
        plan, rij, mesh, filter_type="cheby1", alpha=1.0,
    )
    assert pipe.halo > 0, "causal filter must require a halo"
    segs = pipe.segment_stream(st.data)
    out = pipe.run(segs)

    seq = pipe.run_reference_sequential(segs)
    for k in ("vel", "baz", "mdccm", "sig_tau"):
        np.testing.assert_allclose(
            out[k], seq[k], rtol=1e-5, atol=1e-5,
            err_msg=f"{k}: sharded(2-process) != sequential",
        )

    # physical sanity: recovered back-azimuth near the synthetic truth
    good = out["mdccm"] > 0.6
    assert good.sum() > 0
    d = np.abs((out["baz"][good] - 250.0 + 180.0) % 360.0 - 180.0)
    assert np.median(d) < 5.0, f"baz off: median err {np.median(d)} deg"

    print(
        f"MULTIHOST_SMOKE_OK process={args.process_id}/{args.num_processes} "
        f"devices={n_global} segments={segs.shape[0]} halo={pipe.halo}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
