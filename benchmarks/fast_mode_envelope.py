"""fast_mode correctness envelope: flip rate + max deviation vs band BT.

VERDICT r2 item 5: fast_mode (pure-bf16 inverse-DFT peak search + exact f32
re-evaluation) had a documented-but-unquantified failure: on very-low-BT
bands the bf16 search can land a full cycle off (dense50 max vel dev
0.18 km/s on one window).  Round-3 adds the period-scaled rival-lobe
candidate guard (models.narrowband.band_supp_radius); this bench measures,
on real TPU:

- per-band flip rate (fraction of valid windows whose vel differs from the
  exact HIGH-precision run by > 1e-6 km/s) and max vel/baz deviation,
  with the guard ON and OFF, as a function of the band's time-bandwidth
  product (BT),
- across four workloads: canonical 8-band, dense50 (the known failure),
  a deliberately low-BT sweep, and the recorded golden event,
- step-time cost of fast_mode vs exact so the speed/accuracy trade is a
  number, not folklore.

Writes BENCH_FASTMODE.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def chained_time(step, x, n_chain=10, repeats=5):
    import jax
    import jax.numpy as jnp

    def chained(x):
        def body(i, acc):
            out = step(x + acc * 1e-20)
            return acc + jnp.sum(out["vel"])
        return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0))

    f = jax.jit(chained)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n_chain


def compare(plan, rij, data, time_steps=False):
    """exact vs fast (guard on/off) on one workload -> per-band stats."""
    import jax.numpy as jnp
    from narrow_band_least_squares_tpu.models.narrowband import (
        NarrowBandPipeline,
    )

    x = jnp.asarray(data, jnp.float32)
    runs = {}
    times = {}
    for key, kw in (
        ("exact", dict(fast_mode=False)),
        ("fast_guard", dict(fast_mode=True, fast_guard=True)),
        ("fast_noguard", dict(fast_mode=True, fast_guard=False)),
    ):
        pipe = NarrowBandPipeline(plan, rij, filter_type="cheby1",
                                  alpha=1.0, **kw)
        out = pipe.run_raw(np.asarray(data))
        runs[key] = {k: np.asarray(out[k]) for k in ("vel", "baz", "mdccm")}
        if time_steps:
            times[key + "_ms"] = chained_time(pipe._make_step(), x) * 1e3

    nwin = np.asarray(plan.num_compute_list)
    Wmax = plan.max_windows
    valid = np.arange(Wmax)[None, :] < nwin[:, None]
    bt = list(plan.bt_products())

    def band_stats(fast):
        dv = np.abs(runs[fast]["vel"] - runs["exact"]["vel"])
        db = np.abs(runs[fast]["baz"] - runs["exact"]["baz"])
        db = np.minimum(db, 360.0 - db)
        dv = np.where(valid, dv, 0.0)
        db = np.where(valid, db, 0.0)
        flips = (dv > 1e-6)
        return {
            "flip_rate_per_band": (flips.sum(1) / np.maximum(nwin, 1)).tolist(),
            "flips_total": int(flips.sum()),
            "max_vel_dev_kms": float(dv.max()),
            "max_baz_dev_deg": float(db.max()),
            "max_vel_dev_per_band": dv.max(axis=1).tolist(),
        }

    res = {
        "bt_per_band": [float(b) for b in bt],
        "windows_per_band": nwin.tolist(),
        "guard": band_stats("fast_guard"),
        "noguard": band_stats("fast_noguard"),
    }
    if times:
        res["step_times"] = times
    return res


def main():
    import jax

    from narrow_band_least_squares_tpu.io import synthetic_plane_wave
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    report = {"device": str(jax.devices()[0])}

    st = synthetic_plane_wave(
        nchans=8, duration_s=1200.0, fs=20.0, baz_deg=230.0,
        trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0, seed=42,
    )
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)

    # 1) canonical 8-band (with step-time cost of fast mode)
    fl, nb, _ = get_freqlist(0.1, 5.0, "log", 8)
    wl = get_winlenlist("adaptive", nb, 50, 60, 30)
    plan = make_plan(fl, "log", wl, 0.5, st.npts, st.fs)
    report["canonical"] = compare(plan, rij, st.data, time_steps=True)
    print("canonical", json.dumps(report["canonical"]["guard"]), flush=True)

    # 2) dense50 (the documented 0.18 km/s failure workload)
    fl50, nb50, _ = get_freqlist(0.1, 5.0, "log", 50)
    wl50 = get_winlenlist("adaptive", nb50, 50, 60, 30)
    plan50 = make_plan(fl50, "log", wl50, 0.5, st.npts, st.fs)
    report["dense50"] = compare(plan50, rij, st.data, time_steps=True)
    print("dense50", json.dumps(report["dense50"]["guard"]), flush=True)

    # 3) deliberately low-BT sweep: narrow log bands at low frequency
    st_lo = synthetic_plane_wave(
        nchans=8, duration_s=1200.0, fs=20.0, baz_deg=230.0,
        trace_vel_kms=0.34, f0=0.15, bandwidth=0.25, snr=6.0, seed=11,
    )
    fl_lo, nb_lo, _ = get_freqlist(0.05, 0.6, "log", 16)
    wl_lo = get_winlenlist("constant", nb_lo, 60, 60, 60)
    plan_lo = make_plan(fl_lo, "log", wl_lo, 0.5, st_lo.npts, st_lo.fs)
    report["lowbt16"] = compare(plan_lo, rij, st_lo.data)
    print("lowbt16", json.dumps(report["lowbt16"]["guard"]), flush=True)

    # 4) recorded golden event (same fixture path as tests/test_golden_event)
    from narrow_band_least_squares_tpu.io.fdsn import gather_waveforms_fdsn

    DATA = os.path.join(HERE, "..", "tests", "data")
    meta = json.load(open(os.path.join(DATA, "i53_synth_event_meta.json")))

    def _fixture_fetch(url, timeout=60.0):
        name = ("i53_synth_event.mseed" if "dataselect" in url
                else "i53_synth_event.xml" if "level=response" in url
                else "i53_synth_event.txt")
        with open(os.path.join(DATA, name), "rb") as f:
            return f.read()

    t0 = meta["start_epoch"]
    gst = gather_waveforms_fdsn(
        "IRIS", "IM", "I53H*", "", "BDF", t0, t0 + meta["duration_s"],
        remove_response=True, _fetch=_fixture_fetch,
    )
    g_rij = get_rij(gst.latitudes, gst.longitudes, gst.nchans)
    fl_g, nb_g, _ = get_freqlist(0.1, 5.0, "log", 8)
    wl_g = get_winlenlist("adaptive", nb_g, 50, 60, 30)
    plan_g = make_plan(fl_g, "log", wl_g, 0.5, gst.npts, gst.fs)
    report["golden_event"] = compare(plan_g, g_rij, gst.data)
    print("golden_event", json.dumps(report["golden_event"]["guard"]),
          flush=True)

    # verdict summary
    tot_guard = sum(report[w]["guard"]["flips_total"]
                    for w in ("canonical", "dense50", "lowbt16",
                              "golden_event"))
    tot_noguard = sum(report[w]["noguard"]["flips_total"]
                      for w in ("canonical", "dense50", "lowbt16",
                                "golden_event"))
    maxdev_guard = max(report[w]["guard"]["max_vel_dev_kms"]
                       for w in ("canonical", "dense50", "lowbt16",
                                 "golden_event"))
    report["summary"] = {
        "flips_total_guard": tot_guard,
        "flips_total_noguard": tot_noguard,
        "max_vel_dev_kms_guard": maxdev_guard,
    }
    print("summary", json.dumps(report["summary"]), flush=True)

    with open("BENCH_FASTMODE.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
