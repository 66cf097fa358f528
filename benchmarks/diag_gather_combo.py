"""gather-nobucket combo: where does merged diverge from single, standalone?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
from narrow_band_least_squares_tpu.ops import filters as Fops
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
data = np.stack([s.data for s in streams])

kw = dict(alpha=0.75, window_method="gather", bucket_bands=False,
          lts_funnel_k=4)
base = NarrowBandPipeline(plan, rijs[0], **kw)

y_all = jnp.stack([
    Fops.filter_bank_fft(jnp.asarray(data[k], base.dtype), base._h_bank,
                         base._taper, base.nfft_filter, base.zerophase)
    for k in range(4)
])

tau_m, rho_m, _ = jax.jit(base._delays_batched)(y_all[:2])
tau_s, rho_s, _ = jax.jit(base._delays)(y_all[0])
tau_m = np.asarray(tau_m[0]); tau_s = np.asarray(tau_s)
rho_m = np.asarray(rho_m[0]); rho_s = np.asarray(rho_s)
print("tau bitwise:", (tau_m == tau_s).all(),
      " max dlag:", np.abs(tau_m - tau_s).max() * plan.fs)
print("rho bitwise:", (rho_m == rho_s).all(),
      " max drho:", np.abs(rho_m - rho_s).max())
bad = np.argwhere(np.abs(tau_m - tau_s) * plan.fs > 1e-6)
for b, w, p in bad[:10]:
    print(f"  band={b} win={w} pair={p}: lag_m={tau_m[b,w,p]*plan.fs:+.3f} "
          f"lag_s={tau_s[b,w,p]*plan.fs:+.3f}")

# window extraction itself
win_m = jax.jit(lambda y: jax.vmap(base._extract)(y))(y_all[:2])
win_s = jax.jit(base._extract)(y_all[0])
print("win bitwise:", bool((np.asarray(win_m[0]) == np.asarray(win_s)).all()))

# ---- intermediates from inside the FULL programs ----
from narrow_band_least_squares_tpu.models.multiarray import MultiArrayPipeline

batch = MultiArrayPipeline(plan, rijs, **kw)
bb = batch.base

def full_single(x):
    x = x.astype(bb.dtype)
    y = Fops.filter_bank_fft(x, bb._h_bank, bb._taper, bb.nfft_filter,
                             bb.zerophase)
    y = jax.lax.optimization_barrier(y)
    tau, rho, mdccm = jax.lax.optimization_barrier(bb._delays(y))
    return tau, rho, mdccm, bb._solve_masked(tau, mdccm)

def full_merged(x_all):
    y = jax.vmap(lambda x: Fops.filter_bank_fft(
        x.astype(bb.dtype), bb._h_bank, bb._taper, bb.nfft_filter,
        bb.zerophase))(x_all)
    y = jax.lax.optimization_barrier(y)
    outs = [bb._delays_batched(y[i:i + 2]) for i in (0, 2)]
    tau, rho, mdccm = jax.lax.optimization_barrier(
        tuple(jnp.concatenate(p, axis=0) for p in zip(*outs)))
    import functools
    from narrow_band_least_squares_tpu.ops import lts as LTS
    def solve_one(tau1, md1, X, pinv, XtX_inv, cand, Ainv, ok):
        out = LTS.lts_solve(tau1, X, cand, Ainv, ok, batch.h, bb.c_steps,
                            candidate_chunk=bb.lts_candidate_chunk,
                            funnel_k=bb.lts_funnel_k)
        return out["vel"]
    vel = jax.vmap(solve_one)(tau, mdccm, batch._X, batch._pinv,
                              batch._XtX_inv, batch._cand, batch._Ainv,
                              batch._ok)
    return tau, rho, mdccm, vel

tm, rm, mm_, velm = jax.jit(full_merged)(jnp.asarray(data))
ts, rs, ms, outs_s = jax.jit(full_single)(jnp.asarray(data[0]))
print("full-prog tau bitwise:", bool((np.asarray(tm[0]) == np.asarray(ts)).all()),
      " max dlag:", float(np.abs(np.asarray(tm[0]) - np.asarray(ts)).max() * plan.fs))
print("full-prog rho bitwise:", bool((np.asarray(rm[0]) == np.asarray(rs)).all()))
print("full-prog vel max|d|:", float(np.abs(np.asarray(velm[0]) - np.asarray(outs_s["vel"])).max()))

# ---- standalone vmapped vs single lts_solve on this combo's tau ----
from narrow_band_least_squares_tpu.ops import lts as LTS

def lts_one(tau1, X, cand, Ainv, ok, funnel_k):
    return LTS.lts_solve(tau1, X, cand, Ainv, ok, batch.h, bb.c_steps,
                         funnel_k=funnel_k)

for fk in (4, 0):
    vm = jax.jit(jax.vmap(lambda t, X, c, A, o: lts_one(t, X, c, A, o, fk)))(
        jnp.broadcast_to(ts, (4,) + ts.shape), batch._X, batch._cand,
        batch._Ainv, batch._ok)
    sg = jax.jit(lambda t: lts_one(t, batch._X[0], batch._cand[0],
                                   batch._Ainv[0], batch._ok[0], fk))(ts)
    dv = np.abs(np.asarray(vm["vel"][0]) - np.asarray(sg["vel"])).max()
    do = np.abs(np.asarray(vm["objective"][0]) - np.asarray(sg["objective"])).max()
    ro = np.abs(np.asarray(sg["objective"])).max()
    print(f"funnel_k={fk}: standalone vmap-vs-single max|dvel|={dv:.3e} "
          f"max|dobj|={do:.3e} (obj scale {ro:.3e})")

# ---- identical island content: both programs return ONLY vel from solve ----
def single_velonly(x):
    x = x.astype(bb.dtype)
    y = Fops.filter_bank_fft(x, bb._h_bank, bb._taper, bb.nfft_filter,
                             bb.zerophase)
    y = jax.lax.optimization_barrier(y)
    tau, rho, mdccm = jax.lax.optimization_barrier(bb._delays(y))
    out = LTS.lts_solve(tau, bb._X, bb._cand, bb._Ainv, bb._cand_ok,
                        batch.h, bb.c_steps, funnel_k=bb.lts_funnel_k)
    return out["vel"]

vel_s1 = jax.jit(single_velonly)(jnp.asarray(data[0]))
print("velonly single vs merged max|d|:",
      float(np.abs(np.asarray(velm[0]) - np.asarray(vel_s1)).max()))

# and: merged program whose solve loops arrays at single-array shapes
def merged_loop(x_all):
    y = jax.vmap(lambda x: Fops.filter_bank_fft(
        x.astype(bb.dtype), bb._h_bank, bb._taper, bb.nfft_filter,
        bb.zerophase))(x_all)
    y = jax.lax.optimization_barrier(y)
    outs = [bb._delays_batched(y[i:i + 2]) for i in (0, 2)]
    tau, rho, mdccm = jax.lax.optimization_barrier(
        tuple(jnp.concatenate(p, axis=0) for p in zip(*outs)))
    vels = [
        LTS.lts_solve(tau[a], batch._X[a], batch._cand[a], batch._Ainv[a],
                      batch._ok[a], batch.h, bb.c_steps,
                      funnel_k=bb.lts_funnel_k)["vel"]
        for a in range(4)
    ]
    return jnp.stack(vels)

vel_ml = jax.jit(merged_loop)(jnp.asarray(data))
print("loop-solve merged vs single max|d|:",
      float(np.abs(np.asarray(vel_ml[0]) - np.asarray(vel_s1)).max()))

# ---- is the in-program flip exclusively the funnel top_k? ----
def single_fk(x, fk):
    x = x.astype(bb.dtype)
    y = Fops.filter_bank_fft(x, bb._h_bank, bb._taper, bb.nfft_filter,
                             bb.zerophase)
    y = jax.lax.optimization_barrier(y)
    tau, rho, mdccm = jax.lax.optimization_barrier(bb._delays(y))
    out = LTS.lts_solve(tau, bb._X, bb._cand, bb._Ainv, bb._cand_ok,
                        batch.h, bb.c_steps, funnel_k=fk)
    return out["vel"], out["objective"]

def merged_fk(x_all, fk):
    y = jax.vmap(lambda x: Fops.filter_bank_fft(
        x.astype(bb.dtype), bb._h_bank, bb._taper, bb.nfft_filter,
        bb.zerophase))(x_all)
    y = jax.lax.optimization_barrier(y)
    outs = [bb._delays_batched(y[i:i + 2]) for i in (0, 2)]
    tau, rho, mdccm = jax.lax.optimization_barrier(
        tuple(jnp.concatenate(p, axis=0) for p in zip(*outs)))
    def solve_one(t, X, c, A, o):
        out = LTS.lts_solve(t, X, c, A, o, batch.h, bb.c_steps, funnel_k=fk)
        return out["vel"], out["objective"]
    return jax.vmap(solve_one)(tau, batch._X, batch._cand, batch._Ainv,
                               batch._ok)

for fk in (0, 4):
    vs, os_ = jax.jit(lambda x: single_fk(x, fk))(jnp.asarray(data[0]))
    vmm, om = jax.jit(lambda x: merged_fk(x, fk))(jnp.asarray(data))
    dv = float(np.abs(np.asarray(vmm[0]) - np.asarray(vs)).max())
    do = float(np.abs(np.asarray(om[0]) - np.asarray(os_)).max())
    print(f"in-program fk={fk}: max|dvel|={dv:.3e} max|dobj|={do:.3e}")

# ---- fully-isolated per-array solve islands ----
def solve_isolated(t, X, c, A, o, fk):
    t, X, A = jax.lax.optimization_barrier((t, X, A))
    out = LTS.lts_solve(t, X, c, A, o, batch.h, bb.c_steps, funnel_k=fk)
    return jax.lax.optimization_barrier((out["vel"], out["objective"]))

def single_iso(x, fk):
    x = x.astype(bb.dtype)
    y = Fops.filter_bank_fft(x, bb._h_bank, bb._taper, bb.nfft_filter,
                             bb.zerophase)
    y = jax.lax.optimization_barrier(y)
    tau, rho, mdccm = jax.lax.optimization_barrier(bb._delays(y))
    return solve_isolated(tau, bb._X, bb._cand, bb._Ainv, bb._cand_ok, fk)

def merged_iso(x_all, fk):
    y = jax.vmap(lambda x: Fops.filter_bank_fft(
        x.astype(bb.dtype), bb._h_bank, bb._taper, bb.nfft_filter,
        bb.zerophase))(x_all)
    y = jax.lax.optimization_barrier(y)
    outs = [bb._delays_batched(y[i:i + 2]) for i in (0, 2)]
    tau, rho, mdccm = jax.lax.optimization_barrier(
        tuple(jnp.concatenate(p, axis=0) for p in zip(*outs)))
    res = [solve_isolated(tau[a], batch._X[a], batch._cand[a],
                          batch._Ainv[a], batch._ok[a], fk)
           for a in range(4)]
    return jnp.stack([r[0] for r in res]), jnp.stack([r[1] for r in res])

for fk in (4, 0):
    vs, _ = jax.jit(lambda x: single_iso(x, fk))(jnp.asarray(data[0]))
    vmm, _ = jax.jit(lambda x: merged_iso(x, fk))(jnp.asarray(data))
    dv = float(np.abs(np.asarray(vmm[0]) - np.asarray(vs)).max())
    print(f"isolated-solve fk={fk}: max|dvel|={dv:.3e}")

# ---- constants bitwise? ----
for name, a, b in [("X", bb._X, batch._X[0]), ("Ainv", bb._Ainv, batch._Ainv[0]),
                   ("cand", bb._cand, batch._cand[0]), ("ok", bb._cand_ok, batch._ok[0])]:
    print(f"const {name} bitwise:", bool((np.asarray(a) == np.asarray(b)).all()))

# ---- merged program but a=0 uses bb's closure constants verbatim ----
def merged_iso2(x_all):
    y = jax.vmap(lambda x: Fops.filter_bank_fft(
        x.astype(bb.dtype), bb._h_bank, bb._taper, bb.nfft_filter,
        bb.zerophase))(x_all)
    y = jax.lax.optimization_barrier(y)
    outs = [bb._delays_batched(y[i:i + 2]) for i in (0, 2)]
    tau, rho, mdccm = jax.lax.optimization_barrier(
        tuple(jnp.concatenate(p, axis=0) for p in zip(*outs)))
    return solve_isolated(tau[0], bb._X, bb._cand, bb._Ainv, bb._cand_ok, 4)

vm2, _ = jax.jit(merged_iso2)(jnp.asarray(data))
vs4, _ = jax.jit(lambda x: single_iso(x, 4))(jnp.asarray(data[0]))
print("closure-const merged a0 vs single max|d|:",
      float(np.abs(np.asarray(vm2) - np.asarray(vs4)).max()))

# ---- and: the pure standalone solve_isolated on ts with both constant sets ----
f = jax.jit(lambda t: solve_isolated(t, bb._X, bb._cand, bb._Ainv, bb._cand_ok, 4))
g = jax.jit(lambda t: solve_isolated(t, batch._X[0], batch._cand[0],
                                     batch._Ainv[0], batch._ok[0], 4))
va, _ = f(ts); vb, _ = g(ts)
print("standalone both-const sets max|d|:",
      float(np.abs(np.asarray(va) - np.asarray(vb)).max()))
print("standalone vs single-full max|d|:",
      float(np.abs(np.asarray(va) - np.asarray(vs4)).max()))

# ---- pinpoint: first-C-step objectives per candidate, full vs standalone ----
from narrow_band_least_squares_tpu.ops.lts import (
    _c_steps, _trimmed_objective, _rank_along_last, _residuals2)

def funnel_debug(t):
    t, X, Ainv = jax.lax.optimization_barrier((ts if t is None else t,
                                               bb._X, bb._Ainv))
    tau_pairs = t[..., bb._cand]
    s = jnp.einsum("qij,...qj->...qi", Ainv, tau_pairs)
    s1 = _c_steps(t, X, s, batch.h, 1)
    obj1 = _trimmed_objective(t, X, s1, batch.h)
    r2_0 = _residuals2(t, X, s)
    return s1, obj1, r2_0

def single_dbg(x):
    x = x.astype(bb.dtype)
    y = Fops.filter_bank_fft(x, bb._h_bank, bb._taper, bb.nfft_filter,
                             bb.zerophase)
    y = jax.lax.optimization_barrier(y)
    tau, rho, mdccm = jax.lax.optimization_barrier(bb._delays(y))
    return funnel_debug(tau)

s1_f, o1_f, r2_f = jax.jit(single_dbg)(jnp.asarray(data[0]))
s1_a, o1_a, r2_a = jax.jit(lambda t: funnel_debug(t))(ts)
print("r2_0 bitwise:", bool((np.asarray(r2_f) == np.asarray(r2_a)).all()),
      " max|d| rel:", float((np.abs(np.asarray(r2_f) - np.asarray(r2_a)) /
                             (np.abs(np.asarray(r2_a)) + 1e-30)).max()))
print("s1 bitwise:", bool((np.asarray(s1_f) == np.asarray(s1_a)).all()))
do = np.abs(np.asarray(o1_f) - np.asarray(o1_a))
print("obj1 bitwise:", bool((do == 0).all()), " max|d|:", float(do.max()))
bad = np.argwhere(do > 1e-12)
print("obj1 diffs at (band, win, cand):", bad[:10].tolist())

# ---- array 2: tau parity, chunk [2:4] vs single ----
tm2, rm2, _ = jax.jit(bb._delays_batched)(y_all[2:4])
ts2, rs2, _ = jax.jit(bb._delays)(y_all[2])
tm2 = np.asarray(tm2[0]); ts2 = np.asarray(ts2)
print("arr2 tau bitwise:", (tm2 == ts2).all(),
      " max dlag:", float(np.abs(tm2 - ts2).max() * plan.fs))
bad = np.argwhere(np.abs(tm2 - ts2) * plan.fs > 1e-6)
print("count:", len(bad))
for b, w, p in bad[:6]:
    print(f"  band={b} win={w} pair={p}: m={tm2[b,w,p]*plan.fs:+.4f} "
          f"s={ts2[b,w,p]*plan.fs:+.4f} rho_m={np.asarray(rm2)[0,b,w,p]:.6f} "
          f"rho_s={np.asarray(rs2)[b,w,p]:.6f}")
