"""band_limit_db timing/accuracy matrix on TPU.  Writes BENCH_BANDLIMIT.json.

Accuracy (CPU, canonical synthetic event, confident windows mdccm>0.5):
  canonical8 -40 dB: 98.6% identical lags, vel maxdev 4e-4 km/s
  dense50    -40 dB: 79% identical    (low-BT bands cycle-skip: UNSAFE)
  dense50    -60 dB: 92.5%, vel maxdev 0.18 km/s  (marginal)
  dense50    -80 dB: 98.2%, vel maxdev 0.006 km/s (safe)
Guidance: use band_limit_db='auto' (BT-sweep-calibrated per-bucket
threshold, see bt_sweep section / bench_bt_sweep.py); fixed -40 dB is
safe for standard octave/log plans (BT >~ 4).  Residual dense-sweep
deviations at 'auto' are single-lag jitter (maxdev ~0.008 km/s), not
cycle skips.  Validate on your own workload.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import numpy as np, jax, jax.numpy as jnp
from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.utils.plan import (
    get_freqlist, get_winlenlist, make_plan,
)
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
from bench import bench_chained

st = synthetic_plane_wave(nchans=8, duration_s=1200.0, fs=20.0, baz_deg=230.0,
                          trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0,
                          seed=42)
rij = get_rij(st.latitudes, st.longitudes, st.nchans)
x = jnp.asarray(st.data, jnp.float32)

# merge-preserve sections other tools own (bench_bt_sweep's bt_sweep)
try:
    with open("BENCH_BANDLIMIT.json") as f:
        out = json.load(f)
except FileNotFoundError:
    out = {}
out["device"] = str(jax.devices()[0])
out["accuracy_note"] = __doc__.split("Accuracy")[1].strip()
for name, nb_req, chain, dbs in (
    ("canonical8", 8, 10, (40.0, "auto")),
    ("dense50", 50, 5, (60.0, 80.0, "auto")),
):
    fl, nb, _ = get_freqlist(0.1, 5.0, "log", nb_req)
    wl = get_winlenlist("adaptive", nb, 50, 60, 30)
    plan = make_plan(fl, "log", wl, 0.5, st.npts, st.fs)
    exact = NarrowBandPipeline(plan, rij, alpha=1.0)
    a = {k: np.asarray(v) for k, v in exact.run_raw(st.data).items()}
    for db in dbs:
        pipe = NarrowBandPipeline(plan, rij, alpha=1.0, band_limit_db=db)
        t = bench_chained(pipe, x, n_chain=chain, repeats=5)
        key = f"{name}_bl{db if db == 'auto' else int(db)}"
        out[key + "_ms"] = round(t * 1e3, 3)
        b = {k: np.asarray(v) for k, v in pipe.run_raw(st.data).items()}
        good = a["mdccm"] > 0.5
        out[key + "_same_vel_pct"] = round(
            100.0 * float(np.mean(a["vel"][good] == b["vel"][good])), 2)
        out[key + "_vel_maxdev"] = float(
            np.max(np.abs(a["vel"][good] - b["vel"][good])))
        print(key, out[key + "_ms"], "ms",
              out[key + "_same_vel_pct"], "% same", flush=True)
    with open("BENCH_BANDLIMIT.json", "w") as f:
        json.dump(out, f, indent=1)
print(json.dumps(out))
