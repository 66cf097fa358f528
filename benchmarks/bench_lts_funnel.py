"""FAST-LTS funnel timing/accuracy matrix on TPU (BENCH_LTS_FUNNEL.json).

VERDICT r4 item 1: every entry carries CONFIDENT-window (mdccm>0.6)
deviation columns, not just all-window maxima — the all-window maxdev is
dominated by non-confident windows whose trimmed objective is flat
(several near-equal optima; which one wins is meaningless), while the
production question is whether confident results move.  Measured answer
(also benchmarks CPU sweep, funnel_char): at k>=8 the funnel reproduces
exhaustive LTS exactly on canonical8/lowbt and within 2.9e-4 km/s on
dense50 confident windows; k=16 is exact on clean P=66/P=120 arrays too.
`lts_funnel_k='auto'` = max(16, ceil(Q/24)).
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.utils.plan import get_freqlist, get_winlenlist, make_plan
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline

st = synthetic_plane_wave(nchans=8, duration_s=1200.0, fs=20.0, baz_deg=230.0,
                          trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0, seed=42)
rij = get_rij(st.latitudes, st.longitudes, st.nchans)
x = jnp.asarray(st.data, jnp.float32)

def bench(pipe, n_chain=10, repeats=5):
    step = pipe._make_step()
    def chained(x):
        def body(i, carry):
            x, acc = carry
            out = step(x + acc * 1e-20)
            return (x, acc + jnp.sum(out["vel"]))
        _, acc = jax.lax.fori_loop(0, n_chain, body, (x, jnp.float32(0)))
        return acc
    f = jax.jit(chained)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n_chain

from bench import fit_chain

def bench_fit(pipe, n_lo, n_hi):
    return fit_chain(bench(pipe, n_chain=n_lo, repeats=3),
                     bench(pipe, n_chain=n_hi, repeats=3), n_lo, n_hi)[0]

def accuracy(r0, r1, conf):
    dv = np.abs(np.asarray(r0["vel"]) - np.asarray(r1["vel"]))
    same = np.asarray(r0["flags"]) == np.asarray(r1["flags"])
    return {
        "flag_agreement": float(np.mean(same)),
        "conf_flag_agreement": float(np.mean(same[conf])),
        "maxdev_vel": float(dv.max()),
        "conf_maxdev_vel": float(dv[conf].max()),
    }

out = {"_note": "two-point chain fit (RPC-overhead-free), round 5; "
                "conf = mdccm>0.6 windows of the exact run"}
for name, nb8 in (("canonical8", 8), ("dense50", 50)):
    fl, nb, _ = get_freqlist(0.1, 5.0, "log", nb8)
    wl = get_winlenlist("adaptive", nb, 50, 60, 30)
    plan = make_plan(fl, "log", wl, 0.5, st.npts, st.fs)
    n_lo, n_hi = (10, 100) if nb8 == 8 else (5, 50)
    exact = NarrowBandPipeline(plan, rij, alpha=0.75)
    t = bench_fit(exact, n_lo, n_hi)
    out[f"{name}_lts_exact"] = t
    print(f"{name}_lts_exact", round(t*1000, 2), "ms", flush=True)
    r0 = exact.run_raw(st.data)
    conf = np.asarray(r0["mdccm"]) > 0.6
    out[f"{name}_conf_windows"] = int(conf.sum())
    for k in (16, 32, "auto"):
        pipe = NarrowBandPipeline(plan, rij, alpha=0.75, lts_funnel_k=k)
        key = f"{name}_lts_funnel{k}"
        t = bench_fit(pipe, n_lo, n_hi)
        out[key] = t
        if k == "auto":
            out[key + "_resolved_k"] = pipe.lts_funnel_k
        acc = accuracy(r0, pipe.run_raw(st.data), conf)
        for ak, av in acc.items():
            out[f"{key}_{ak}"] = av
        print(key, round(t*1000, 2), "ms", json.dumps(acc), flush=True)
    # production combo: auto funnel + auto band limit
    combo = NarrowBandPipeline(plan, rij, alpha=0.75, lts_funnel_k="auto",
                               band_limit_db="auto")
    key = f"{name}_lts_funnelauto_blauto"
    t = bench_fit(combo, n_lo, n_hi)
    out[key] = t
    acc = accuracy(r0, combo.run_raw(st.data), conf)
    for ak, av in acc.items():
        out[f"{key}_{ak}"] = av
    print(key, round(t*1000, 2), "ms", json.dumps(acc), flush=True)
with open("BENCH_LTS_FUNNEL.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
