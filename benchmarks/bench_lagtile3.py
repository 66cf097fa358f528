"""Final round-4 xcorr configs on the committed (two-dot) code.

BENCH_LAGTILE2 ran with the rejected stacked-concat inverse; this
re-times the winners on the shipped implementation and records the
numbers the README/BENCH_DETAILS cite.  Writes BENCH_LAGTILE3.json.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import numpy as np, jax, jax.numpy as jnp
from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.utils.plan import (
    get_freqlist, get_winlenlist, make_plan,
)
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
from bench import bench_chained, cost_and_mfu

st = synthetic_plane_wave(nchans=8, duration_s=1200.0, fs=20.0, baz_deg=230.0,
                          trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0,
                          seed=42)
rij = get_rij(st.latitudes, st.longitudes, st.nchans)
x = jnp.asarray(st.data, jnp.float32)

CONFIGS = [
    ("default", dict()),                          # chunk16 + tile512, exact
    ("c0_t1024", dict(xcorr_chunk_mb=0.0, xcorr_lag_tile=1024)),
    ("c64_t512", dict(xcorr_chunk_mb=64.0, xcorr_lag_tile=512)),
    ("bl40", dict(band_limit_db=40.0)),           # production mode
]

out = {"device": str(jax.devices()[0]), "note": "two-dot inverse (shipped)"}
for name, nb_req, chain in (("canonical8", 8, 10), ("dense50", 50, 5)):
    fl, nb, _ = get_freqlist(0.1, 5.0, "log", nb_req)
    wl = get_winlenlist("adaptive", nb, 50, 60, 30)
    plan = make_plan(fl, "log", wl, 0.5, st.npts, st.fs)
    ref_vel = None
    for tag, kw in CONFIGS:
        pipe = NarrowBandPipeline(plan, rij, alpha=1.0, **kw)
        t = bench_chained(pipe, x, n_chain=chain, repeats=5)
        key = f"{name}_{tag}"
        out[key] = round(t * 1e3, 3)
        if tag == "default":
            out[key + "_cost"] = cost_and_mfu(pipe, x, t)
        print(key, round(t * 1e3, 2), "ms", flush=True)
        vel = np.asarray(pipe.run_raw(st.data)["vel"])
        if ref_vel is None:
            ref_vel = vel
        else:
            ident = np.array_equal(ref_vel, vel)
            out[key + "_vel_bitident"] = bool(ident)
            if not ident:
                out[key + "_vel_maxdev"] = float(np.abs(ref_vel - vel).max())
    # LTS at the default config
    pipe = NarrowBandPipeline(plan, rij, alpha=0.75)
    t = bench_chained(pipe, x, n_chain=chain, repeats=3)
    out[f"{name}_lts_default"] = round(t * 1e3, 3)
    print(f"{name}_lts_default", round(t * 1e3, 2), "ms", flush=True)
    with open("BENCH_LAGTILE3.json", "w") as f:
        json.dump(out, f, indent=1)
print(json.dumps(out))
