"""Multi-device example driver.

Mirror of the reference's ``example_parallel.py`` (joblib band fan-out,
reference ``example_parallel.py:138``), re-expressed the TPU way: on a single
chip bands are already batched, so this driver demonstrates the *sharded*
pipeline over a (time, band) device mesh — the path that scales to pod
slices.  On a 1-device host it still runs (1x1 mesh).

Run:  python examples/example_parallel.py
With a virtual mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/example_parallel.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from narrow_band_least_squares_tpu.io import synthetic_plane_wave
from narrow_band_least_squares_tpu.parallel import (
    ShardedNarrowBandPipeline,
    auto_mesh_shape,
    make_mesh,
)
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import (
    get_freqlist,
    get_winlenlist,
    make_plan,
)

FMIN, FMAX, NBANDS = 0.1, 5.0, 8
SEGMENT_S = 1200.0      # one reference-sized run per segment
HOURS = 2.0             # total stream duration to process


def main():
    if os.environ.get("NBLS_DISTRIBUTED") == "auto":
        # pod-slice launch (scripts/launch_pod_slice.sh): discover the
        # cluster from TPU metadata before any device use
        from narrow_band_least_squares_tpu.parallel import (
            initialize_distributed,
        )
        initialize_distributed(auto=True)
    devices = jax.devices()
    nt, nb = auto_mesh_shape(len(devices), nbands=NBANDS)
    mesh = make_mesh(nt, nb, devices)
    print(f"devices={len(devices)} mesh=(time={nt}, band={nb})")

    # the stream must cover at least one segment per time shard
    duration_s = max(HOURS * 3600.0, nt * SEGMENT_S)
    st = synthetic_plane_wave(
        nchans=8, duration_s=duration_s, fs=20.0, baz_deg=230.0,
        trace_vel_kms=0.34, f0=0.8, bandwidth=1.4, snr=6.0, seed=42,
    )
    freqlist, nbands, fmax = get_freqlist(FMIN, FMAX, "log", NBANDS)
    winlens = get_winlenlist("adaptive", nbands, 50, 60, 30)
    plan = make_plan(freqlist, "log", winlens, 0.5, int(SEGMENT_S * st.fs), st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)

    pipe = ShardedNarrowBandPipeline(
        plan, rij, mesh, filter_type="cheby1", alpha=1.0,
    )
    segs = pipe.segment_stream(st.data)
    out = pipe.run(segs)

    good = out["mdccm"] > 0.6
    print(
        f"segments={segs.shape[0]} bands={plan.nbands} "
        f"windows/segment={plan.max_windows}"
    )
    print(
        f"good windows: {int(good.sum())}/{good.size}  "
        f"median baz={np.median(out['baz'][good]):.1f} deg  "
        f"median vel={np.median(out['vel'][good]):.3f} km/s"
    )


if __name__ == "__main__":
    main()
