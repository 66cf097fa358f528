"""CPU characterization behind lts_funnel_k='auto' (VERDICT r4 item 1).

Measures funnel-vs-exhaustive LTS deviation separately on CONFIDENT
(mdccm>0.6) and all windows, across plans (canonical8 / dense50 / a
BT=1.5 low-BT plan) and funnel sizes, plus larger co-arrays (P=66 and
P=120 via 12/16-element geometries).  Round-5 findings (reproduced by
this script; TPU confirmations in BENCH_LTS_FUNNEL.json):

- k>=8 reproduces exhaustive LTS EXACTLY on canonical8/lowbt, and k=16
  is exact on the clean P=66/P=120 arrays;
- dense50 confident-window vel maxdev is 2.9e-4 km/s (CPU) / 9.2e-4
  (TPU) at k in [8, 32] — the previously-reported 0.126 km/s outlier
  occurs only on NON-confident windows whose trimmed objective is flat;
- hence auto = max(16, ceil(Q/24)): 16 is measured-safe at Q=378 and
  the Q-scaling keeps proportional headroom for larger co-arrays.

Runs on the JAX CPU backend (funnel-vs-full comparisons are within one
backend; ~5 min).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import (
    get_freqlist, get_winlenlist, make_plan,
)


def compare(name, st, plan, rij, ks):
    exact = NarrowBandPipeline(plan, rij, alpha=0.75)
    r0 = {k: np.asarray(v) for k, v in exact.run_raw(st.data).items()}
    conf = r0["mdccm"] > 0.6
    print(f"--- {name}: conf windows {int(conf.sum())}/{conf.size}")
    for k in ks:
        p = NarrowBandPipeline(plan, rij, alpha=0.75, lts_funnel_k=int(k))
        r1 = {kk: np.asarray(v) for kk, v in p.run_raw(st.data).items()}
        dv = np.abs(r0["vel"] - r1["vel"])
        fa = np.mean((r0["flags"] == r1["flags"])[conf])
        print(f"{name} k={k}: conf_maxdev {dv[conf].max():.6f} "
              f"all_maxdev {dv.max():.6f} conf_flag_agree {fa:.5f}",
              flush=True)


def main():
    st = synthetic_plane_wave(
        nchans=8, duration_s=1200.0, fs=20.0, baz_deg=230.0,
        trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0, seed=42,
    )
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    for name in ("canonical8", "dense50", "lowbt"):
        if name == "lowbt":
            bw = 1.5 / 30.0
            fl = [0.45 + k * bw for k in range(5)]
            plan = make_plan(fl, "linear", [30.0] * 4, 0.5, st.npts, st.fs)
        else:
            nb8 = {"canonical8": 8, "dense50": 50}[name]
            fl, nb, _ = get_freqlist(0.1, 5.0, "log", nb8)
            wl = get_winlenlist("adaptive", nb, 50, 60, 30)
            plan = make_plan(fl, "log", wl, 0.5, st.npts, st.fs)
        compare(name, st, plan, rij, (8, 16, 32, 64))

    # larger co-arrays: P=66 (12 ch) and P=120 (16 ch), with an outlier
    for nch, outl in ((12, (3, 9)), (16, (5,))):
        st2 = synthetic_plane_wave(
            nchans=nch, duration_s=300.0, fs=10.0, baz_deg=120.0,
            trace_vel_kms=0.30, f0=0.6, bandwidth=0.8, snr=10.0,
            aperture_km=2.5, seed=5, outlier_channels=outl,
        )
        fl, nb, _ = get_freqlist(0.25, 1.2, "log", 3)
        wl = get_winlenlist("constant", nb, 30, 0, 0)
        plan = make_plan(fl, "log", wl, 0.5, st2.npts, st2.fs)
        rij2 = get_rij(st2.latitudes, st2.longitudes, st2.nchans)
        P = nch * (nch - 1) // 2
        Q = P * (P - 1) // 2
        compare(f"P{P}", st2, plan, rij2,
                (16, max(16, -(-Q // 24)), 128))


if __name__ == "__main__":
    main()
