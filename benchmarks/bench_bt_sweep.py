"""band_limit_db='auto' calibration on a controlled BT sweep.

VERDICT r4 item 3: the BT-aware auto threshold (models.narrowband.
band_limit_auto_db) rested on two measured points (BT>=3.8 -> 40 dB,
BT~1.3 -> 80 dB) with the mid-BT region uncalibrated.  This bench
synthesizes plans whose bands sit at controlled time-bandwidth products
(winlen * bandwidth = BT in {1.5, 2, 2.5, 3, 3.5, 5}), sweeps the
band-limit threshold, and measures confident-window lag identity vs the
exact (all-bins) pipeline per (BT, dB) cell.  The table pins the minimum
threshold that keeps conf-window lag identity >= 99% at each BT, which
is what `band_limit_auto_db`'s curve must dominate (with margin).

Runs on the JAX CPU backend: accuracy is backend-independent (the
band-limit bin subset is decided on host; the remaining math is the same
program), and 48 (BT, dB) cells would cost ~minutes of remote TPU
compile each.  Writes the `bt_sweep` section of BENCH_BANDLIMIT.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # before first device use

import numpy as np

from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.models.narrowband import (
    NarrowBandPipeline,
    band_limit_auto_db,
)
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import make_plan

BTS = [1.5, 2.0, 2.5, 3.0, 3.5, 5.0]
DBS = [30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0]
WINLEN = 30.0
FS = 20.0
DUR = 1200.0
TARGET_IDENTITY = 0.99


def bt_plan(bt: float, npts: int):
    """4 contiguous linear bands of width BT/WINLEN inside the signal band."""
    bw = bt / WINLEN
    f0 = 0.45
    freqlist = [f0 + k * bw for k in range(5)]
    return make_plan(freqlist, "linear", [WINLEN] * 4, 0.5, npts, FS)


def main():
    st = synthetic_plane_wave(
        nchans=8, duration_s=DUR, fs=FS, baz_deg=230.0, trace_vel_kms=0.34,
        f0=0.8, bandwidth=1.2, snr=8.0, seed=42,
    )
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)

    sweep = {"winlen_s": WINLEN, "fs": FS, "duration_s": DUR,
             "target_conf_lag_identity": TARGET_IDENTITY,
             "thresholds_db": DBS, "cells": {}}
    required = {}
    for bt in BTS:
        plan = bt_plan(bt, st.npts)
        exact = NarrowBandPipeline(plan, rij, alpha=1.0)
        a = {k: np.asarray(v) for k, v in exact.run_raw(st.data).items()}
        good = a["mdccm"] > 0.6
        n_conf = int(good.sum())
        row = {}
        req = None
        for db in DBS:
            pipe = NarrowBandPipeline(plan, rij, alpha=1.0, band_limit_db=db)
            b = {k: np.asarray(v) for k, v in pipe.run_raw(st.data).items()}
            ident = float(np.mean(a["vel"][good] == b["vel"][good]))
            maxdev = float(np.max(np.abs(a["vel"][good] - b["vel"][good])))
            row[str(int(db))] = {"conf_lag_identity": round(ident, 5),
                                 "vel_maxdev_kms": maxdev}
            if req is None and ident >= TARGET_IDENTITY:
                req = db
            print(f"BT={bt} dB={db}: identity {ident:.4f} "
                  f"maxdev {maxdev:.4g}", flush=True)
        auto = band_limit_auto_db(bt)
        required[bt] = req
        sweep["cells"][str(bt)] = {
            "conf_windows": n_conf,
            "by_db": row,
            "min_db_for_target": req,
            "auto_db": auto,
            "auto_meets_target": bool(req is not None and auto >= req),
        }

    sweep["required_db_by_bt"] = {str(k): v for k, v in required.items()}
    try:
        with open("BENCH_BANDLIMIT.json") as f:
            out = json.load(f)
    except FileNotFoundError:
        out = {}
    out["bt_sweep"] = sweep
    with open("BENCH_BANDLIMIT.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(sweep["required_db_by_bt"]))
    for bt in BTS:
        c = sweep["cells"][str(bt)]
        print(f"BT {bt}: need >= {c['min_db_for_target']} dB, "
              f"auto gives {c['auto_db']:.1f} dB "
              f"({'OK' if c['auto_meets_target'] else 'INSUFFICIENT'})")


if __name__ == "__main__":
    main()
