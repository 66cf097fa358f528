"""Extraction-method shootout on the canonical workload (TPU)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import numpy as np, jax, jax.numpy as jnp
from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.utils.plan import get_freqlist, get_winlenlist, make_plan
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
from narrow_band_least_squares_tpu.ops import filters as F
from narrow_band_least_squares_tpu.ops.windows import (
    extract_windows, extract_windows_patches, extract_windows_strided,
)

st = synthetic_plane_wave(nchans=8, duration_s=1200.0, fs=20.0, baz_deg=230.0,
                          trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0, seed=42)
rij = get_rij(st.latitudes, st.longitudes, st.nchans)
fl, nb, _ = get_freqlist(0.1, 5.0, "log", 8)
wl = get_winlenlist("adaptive", nb, 50, 60, 30)
plan = make_plan(fl, "log", wl, 0.5, st.npts, st.fs)
pipe = NarrowBandPipeline(plan, rij, alpha=1.0, bucket_bands=False)
x = jnp.asarray(st.data, jnp.float32)
y0 = F.filter_bank_fft(x, pipe._h_bank, pipe._taper, pipe.nfft_filter, pipe.zerophase)
y0 = jax.block_until_ready(y0)

def timeit(fn, arg, n_chain=20, repeats=5):
    def chained(a):
        def body(i, carry):
            a, acc = carry
            return (a, acc + fn(a + acc * 1e-20))
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
res["gather"] = timeit(lambda yy: jnp.sum(
    extract_windows(yy, pipe._idx, pipe._len_mask, pipe._lengths)), y0)
print("gather", res["gather"]*1e3, flush=True)
res["patches"] = timeit(lambda yy: jnp.sum(
    extract_windows_patches(yy, plan, pipe._len_mask, pipe._lengths)), y0)
print("patches", res["patches"]*1e3, flush=True)
res["strided"] = timeit(lambda yy: jnp.sum(
    extract_windows_strided(yy, plan, pipe._len_mask, pipe._lengths)), y0)
print("strided", res["strided"]*1e3, flush=True)
print(json.dumps({k: v*1e3 for k, v in res.items()}))
