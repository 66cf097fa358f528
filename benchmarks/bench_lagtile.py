"""Lag-tile sweep on TPU: canonical + dense50 OLS step vs tile size.

VERDICT r3 item 1: tiling the lag axis of the inverse-DFT matmul with a
running (max, argmax) keeps the (B, W, P, nlag) cc tensor out of HBM.
Targets: canonical OLS <= 3.5 ms, dense50 <= 15 ms, identical selections.
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

out = {"device": str(jax.devices()[0])}
for name, nb_req, chain in (("canonical8", 8, 10), ("dense50", 50, 5)):
    fl, nb, _ = get_freqlist(0.1, 5.0, "log", nb_req)
    wl = get_winlenlist("adaptive", nb, 50, 60, 30)
    plan = make_plan(fl, "log", wl, 0.5, st.npts, st.fs)
    ref_sel = None
    for tile in (0, 256, 512, 1024):
        pipe = NarrowBandPipeline(plan, rij, alpha=1.0, xcorr_lag_tile=tile)
        t = bench_chained(pipe, x, n_chain=chain, repeats=5)
        key = f"{name}_tile{tile}"
        out[key] = t
        out[key + "_cost"] = cost_and_mfu(pipe, x, t)
        print(key, round(t * 1e3, 2), "ms", flush=True)
        r = pipe.run_raw(st.data)
        vel = np.asarray(r["vel"])
        if ref_sel is None:
            ref_sel = vel
        else:
            ident = np.array_equal(ref_sel, vel)
            out[key + "_vel_bitident_vs_tile0"] = bool(ident)
            if not ident:
                d = np.abs(ref_sel - vel)
                out[key + "_vel_maxdev"] = float(d.max())
                out[key + "_vel_ndiff"] = int((d > 0).sum())
            print(key, "bit-identical vs tile0:", ident, flush=True)

with open("BENCH_LAGTILE.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({k: v for k, v in out.items() if isinstance(v, float)}))
