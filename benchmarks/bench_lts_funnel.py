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

out = {"_note": "two-point chain fit (RPC-overhead-free), round 4"}
for name, nb8 in (("canonical8", 8), ("dense50", 50)):
    fl, nb, _ = get_freqlist(0.1, 5.0, "log", nb8)
    wl = get_winlenlist("adaptive", nb, 50, 60, 30)
    plan = make_plan(fl, "log", wl, 0.5, st.npts, st.fs)
    pipe = NarrowBandPipeline(plan, rij, alpha=0.75)
    t = bench_fit(pipe, 10 if nb8 == 8 else 5, 100 if nb8 == 8 else 50)
    out[f"{name}_lts_exact"] = t
    print(f"{name}_lts_exact", round(t*1000, 2), "ms", flush=True)
    for k in (16, 32):
        pipe = NarrowBandPipeline(plan, rij, alpha=0.75, lts_funnel_k=k)
        t = bench_fit(pipe, 10 if nb8 == 8 else 5, 100 if nb8 == 8 else 50)
        out[f"{name}_lts_funnel{k}"] = t
        print(f"{name}_lts_funnel{k}", round(t*1000, 2), "ms", flush=True)
    p0 = NarrowBandPipeline(plan, rij, alpha=0.75)
    p1 = NarrowBandPipeline(plan, rij, alpha=0.75, lts_funnel_k=16)
    r0, r1 = p0.run_raw(st.data), p1.run_raw(st.data)
    agree = float(np.mean(np.asarray(r0["flags"]) == np.asarray(r1["flags"])))
    dv = float(np.max(np.abs(np.asarray(r0["vel"]) - np.asarray(r1["vel"]))))
    out[f"{name}_funnel16_flag_agreement"] = agree
    out[f"{name}_funnel16_maxdev_vel"] = dv
    print(name, "funnel16 flags agree:", agree, "maxdev vel:", dv, flush=True)
with open("BENCH_LTS_FUNNEL.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
