"""Diagnose the fast_mode merged-vs-individual lag flips (VERDICT r2 weak #1).

Runs the failing test scenario, intercepts tau/rho per (array, band, window,
pair) from both paths, and reports every cell where they disagree: lag
distance in samples, exact-cc gap at the two candidate lags, and band BT.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.models.multiarray import MultiArrayPipeline
from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import (
    get_freqlist, get_winlenlist, make_plan,
)

streams = [
    synthetic_plane_wave(
        nchans=4, duration_s=240.0, fs=10.0,
        baz_deg=45.0 + 90.0 * k, trace_vel_kms=0.30 + 0.02 * k,
        f0=0.6, bandwidth=0.8, snr=10.0, seed=100 + k,
    )
    for k in range(4)
]
freqlist, nbands, _ = get_freqlist(0.3, 1.5, "log", 2)
winlens = get_winlenlist("constant", nbands, 30, 0, 0)
plan = make_plan(freqlist, "log", winlens, 0.5, streams[0].npts, streams[0].fs)
rijs = [get_rij(s.latitudes, s.longitudes, s.nchans) for s in streams]

kw = dict(alpha=0.75, max_lag_s=8.0, fast_mode=True, lts_funnel_k=4)
batch = MultiArrayPipeline(plan, rijs, **kw)
data = np.stack([s.data for s in streams])

# Intercept delays from both paths.
import jax.numpy as jnp
from narrow_band_least_squares_tpu.ops import filters as Fops

base = batch.base


def filtered(x):
    return Fops.filter_bank_fft(
        jnp.asarray(x, base.dtype), base._h_bank, base._taper,
        base.nfft_filter, base.zerophase,
    )


y_all = jnp.stack([filtered(data[k]) for k in range(4)])   # (A, B, C, T)

tau_m, rho_m, md_m = jax.jit(base._delays_batched)(y_all)
tau_s = []
rho_s = []
for k in range(4):
    single = NarrowBandPipeline(plan, rijs[k], **kw)
    t, r, _ = jax.jit(single._delays)(filtered(data[k]))
    tau_s.append(np.asarray(t))
    rho_s.append(np.asarray(r))
tau_s = np.stack(tau_s)
rho_s = np.stack(rho_s)
tau_m = np.asarray(tau_m)
rho_m = np.asarray(rho_m)

fs = plan.fs
dl = np.abs(tau_m - tau_s) * fs      # lag distance in samples
bad = np.argwhere(dl > 1e-6)
print(f"total cells: {dl.size}, mismatched: {len(bad)}")
for a, b, w, p in bad[:50]:
    print(
        f"  arr={a} band={b} win={w} pair={p}: "
        f"lag_m={tau_m[a, b, w, p] * fs:+.3f} lag_s={tau_s[a, b, w, p] * fs:+.3f} "
        f"dlag={dl[a, b, w, p]:.3f} samp  "
        f"rho_m={rho_m[a, b, w, p]:.6f} rho_s={rho_s[a, b, w, p]:.6f} "
        f"drho={rho_m[a, b, w, p] - rho_s[a, b, w, p]:+.2e}"
    )
bt = plan.bt_products()
print("band BT:", bt)

# ---- stage 2: chunked merge (the actual step path, merge_chunk_arrays=2) ----
outs = [jax.jit(base._delays_batched)(y_all[i:i + 2]) for i in (0, 2)]
tau_c = np.concatenate([np.asarray(o[0]) for o in outs], axis=0)
rho_c = np.concatenate([np.asarray(o[1]) for o in outs], axis=0)
dl_c = np.abs(tau_c - tau_s) * fs
print(f"chunked-merge mismatched tau cells: {(dl_c > 1e-6).sum()}")
print(f"chunked-merge tau bitwise equal: {(tau_c == tau_s).all()}")
print(f"chunked-merge rho max |diff|: {np.abs(rho_c - rho_s).max():.3e}")
bad = np.argwhere(dl_c > 1e-6)
for a, b, w, p in bad[:20]:
    print(
        f"  arr={a} band={b} win={w} pair={p}: "
        f"lag_c={tau_c[a, b, w, p] * fs:+.3f} lag_s={tau_s[a, b, w, p] * fs:+.3f} "
        f"dlag={dl_c[a, b, w, p]:.3f} samp "
        f"rho_c={rho_c[a, b, w, p]:.6f} rho_s={rho_s[a, b, w, p]:.6f}"
    )

# ---- stage 3: full pipeline outputs ----
out_m = batch.run_raw(data)
for k in range(4):
    single = NarrowBandPipeline(plan, rijs[k], **kw)
    ref = single.run_raw(data[k])
    dv = np.abs(np.asarray(out_m["vel"][k]) - np.asarray(ref["vel"]))
    dfl = (np.asarray(out_m["flags"][k]) != np.asarray(ref["flags"])).sum()
    print(f"arr {k}: max |dvel|={dv.max():.3e} at {np.argwhere(dv > 1e-5).ravel()} flag diffs={dfl}")

# ---- stage 4: vmapped filter vs single filter ----
y_vm = jax.jit(jax.vmap(filtered))(data)
print("vmapped filter bitwise equal:", bool((np.asarray(y_vm) == np.asarray(y_all)).all()),
      " max|d|:", float(np.abs(np.asarray(y_vm) - np.asarray(y_all)).max()))

# ---- stage 5: vmapped LTS vs single LTS given identical tau ----
from narrow_band_least_squares_tpu.ops import lts as LTS2
tau_in = jnp.asarray(tau_s)

def lts_one(tau, X, cand, Ainv, ok):
    return LTS2.lts_solve(tau, X, cand, Ainv, ok, batch.h, base.c_steps,
                          candidate_chunk=base.lts_candidate_chunk,
                          funnel_k=base.lts_funnel_k)

vm = jax.jit(jax.vmap(lts_one))(tau_in, batch._X, batch._cand, batch._Ainv, batch._ok)
for k in range(4):
    sg = jax.jit(lts_one)(tau_in[k], batch._X[k], batch._cand[k], batch._Ainv[k], batch._ok[k])
    dv = np.abs(np.asarray(vm["vel"][k]) - np.asarray(sg["vel"]))
    dr = (np.asarray(vm["retained"][k]) != np.asarray(sg["retained"])).sum()
    print(f"LTS arr {k}: max|dvel|={dv.max():.3e} retained diffs={dr}")
