"""Per-stage timing of the canonical OLS step (chained-steps methodology)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import numpy as np, jax, jax.numpy as jnp
from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.utils.plan import get_freqlist, get_winlenlist, make_plan
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
from narrow_band_least_squares_tpu.ops import filters as F
from narrow_band_least_squares_tpu.ops import xcorr as XC
from narrow_band_least_squares_tpu.ops import solve as SOLVE
from narrow_band_least_squares_tpu.ops.windows import extract_windows

st = synthetic_plane_wave(nchans=8, duration_s=1200.0, fs=20.0, baz_deg=230.0,
                          trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0, seed=42)
rij = get_rij(st.latitudes, st.longitudes, st.nchans)
fl, nb, _ = get_freqlist(0.1, 5.0, "log", 8)
wl = get_winlenlist("adaptive", nb, 50, 60, 30)
plan = make_plan(fl, "log", wl, 0.5, st.npts, st.fs)
pipe = NarrowBandPipeline(plan, rij, alpha=1.0)  # bucketed default
x = jnp.asarray(st.data, jnp.float32)

def timeit_fitted(fn, arg, reduce=lambda o: jnp.sum(o)):
    """Two-point chain fit removing the ~22 ms per-invocation RPC
    (bench.fit_chain)."""
    from bench import fit_chain

    t20 = timeit(fn, arg, n_chain=20, reduce=reduce)
    t100 = timeit(fn, arg, n_chain=100, repeats=3, reduce=reduce)
    return fit_chain(t20, t100, 20, 100)[0]


def timeit(fn, arg, n_chain=20, repeats=5, reduce=lambda o: jnp.sum(o)):
    def chained(a):
        def body(i, carry):
            a, acc = carry
            out = fn(a + acc * 1e-20)
            return (a, acc + reduce(out))
        _, acc = jax.lax.fori_loop(0, n_chain, body, (a, jnp.float32(0)))
        return acc
    f = jax.jit(chained)
    jax.block_until_ready(f(arg))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(f(arg))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n_chain

res = {}

def stage_filter(xx):
    return F.filter_bank_fft(xx, pipe._h_bank, pipe._taper, pipe.nfft_filter, pipe.zerophase)
res["filter"] = timeit_fitted(stage_filter, x)
print("filter", res["filter"]*1e3, flush=True)

y0 = stage_filter(x)

def stage_extract(yy):
    outs = []
    for bk in pipe._buckets:
        outs.append(jnp.sum(extract_windows(yy[bk["band_idx"]], bk["idx"], bk["len_mask"], bk["lengths"])))
    return jnp.stack(outs).sum()
res["extract"] = timeit_fitted(stage_extract, y0, reduce=lambda o: o)
print("extract", res["extract"]*1e3, flush=True)

def stage_xcorr(yy):
    tau, rho, md = pipe._xcorr_bucketed(yy)
    return jnp.sum(tau) + jnp.sum(rho) + jnp.sum(md)
res["extract_xcorr"] = timeit_fitted(stage_xcorr, y0, reduce=lambda o: o)
print("extract+xcorr", res["extract_xcorr"]*1e3, flush=True)

tau0, _, _ = pipe._xcorr_bucketed(y0)
def stage_solve(tt):
    out = SOLVE.ols_solve(tt, pipe._X, pipe._pinv, pipe._XtX_inv)
    return jnp.sum(out["vel"]) + jnp.sum(out["sig_tau"])
res["solve"] = timeit_fitted(stage_solve, tau0, reduce=lambda o: o)
print("solve", res["solve"]*1e3, flush=True)

def full(xx):
    return pipe._make_step()(xx)
res["full"] = timeit_fitted(full, x, reduce=lambda o: jnp.sum(o["vel"]))
print("full", res["full"]*1e3, flush=True)
out = {k: v * 1e3 for k, v in res.items()}
out["_note"] = (
    "ms per step, canonical OLS, two-point chain fit (RPC-free); stage sums exceed 'full' "
    "because XLA fuses across stage boundaries in the full step. "
    "'extract' is the gather path; the default strided extraction only "
    "exists fused inside extract_xcorr."
)
out["_device"] = str(jax.devices()[0])
with open("PROFILE_STAGES.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
