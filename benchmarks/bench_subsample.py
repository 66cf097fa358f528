"""subsample_delays timing on TPU (BENCH_SUBSAMPLE.json).

VERDICT r4 item 4 done-criterion: parabolic sub-sample refinement
composed with the lag-tiled running argmax must sit within ~10% of the
integer-lag tiled step.  Round-5 v5e result: 2.59 ms vs 2.30 ms (+12%)
with the (B, W, P, nlag) cc tensor still never materializing; the
untiled subsample path (full cc materialization per band chunk) is
2.92 ms.  Neighbor extraction uses masked one-hot reductions —
take_along_axis gathers measured 5x the overhead (3.75 ms).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import (
    get_freqlist, get_winlenlist, make_plan,
)
from bench import bench_chained_fitted

st = synthetic_plane_wave(
    nchans=8, duration_s=1200.0, fs=20.0, baz_deg=230.0,
    trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0, seed=42,
)
rij = get_rij(st.latitudes, st.longitudes, st.nchans)
x = jnp.asarray(st.data, jnp.float32)
fl, nb, _ = get_freqlist(0.1, 5.0, "log", 8)
wl = get_winlenlist("adaptive", nb, 50, 60, 30)
plan = make_plan(fl, "log", wl, 0.5, st.npts, st.fs)

out = {}
for name, kw in (
    ("int_tiled", {}),
    ("subsample_tiled", dict(subsample_delays=True)),
    ("subsample_untiled", dict(subsample_delays=True, xcorr_lag_tile=0)),
):
    pipe = NarrowBandPipeline(plan, rij, alpha=1.0, **kw)
    t, _, _ = bench_chained_fitted(pipe, x)
    out[name + "_ms"] = round(t * 1e3, 3)
    print(name, out[name + "_ms"], "ms", flush=True)
out["tiled_overhead_pct"] = round(
    100 * (out["subsample_tiled_ms"] / out["int_tiled_ms"] - 1), 1
)
with open("BENCH_SUBSAMPLE.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
