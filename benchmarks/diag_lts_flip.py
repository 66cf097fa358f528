"""Which LTS option makes the merged-vs-single full programs disagree?"""
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
data = np.stack([s.data for s in streams])


def compare(tag, **kw):
    batch = MultiArrayPipeline(plan, rijs, **kw)
    out = batch.run_raw(data)
    worst = 0.0
    fl = 0
    for k in range(4):
        ref = NarrowBandPipeline(plan, rijs[k], **kw).run_raw(data[k])
        dv = np.abs(np.asarray(out["vel"][k]) - np.asarray(ref["vel"])).max()
        worst = max(worst, float(dv))
        if "flags" in out:
            fl += int((np.asarray(out["flags"][k]) != np.asarray(ref["flags"])).sum())
    print(f"{tag}: max|dvel|={worst:.3e} flag_diffs={fl}")


base_kw = dict(alpha=0.75, max_lag_s=8.0, lts_funnel_k=4)
compare("full-combo         ", **base_kw)
compare("no-funnel          ", alpha=0.75, max_lag_s=8.0)
compare("no-fastmode        ", alpha=0.75, max_lag_s=8.0, lts_funnel_k=4)
compare("funnel-only        ", alpha=0.75, lts_funnel_k=4)
compare("fastmode-ols       ", alpha=1.0, max_lag_s=8.0)
compare("plain-lts          ", alpha=0.75)

# ---- objective gap at the divergent windows ----
import jax.numpy as jnp
from narrow_band_least_squares_tpu.ops import lts as LTS
from narrow_band_least_squares_tpu.ops import filters as Fops

kw = base_kw
batch = MultiArrayPipeline(plan, rijs, **kw)
out_m = batch.run_raw(data)
k = 2
single = NarrowBandPipeline(plan, rijs[k], **kw)
ref = single.run_raw(data[k])
base = batch.base
y = jnp.asarray(Fops.filter_bank_fft(
    jnp.asarray(data[k], base.dtype), base._h_bank, base._taper,
    base.nfft_filter, base.zerophase))
tau, rho, md = jax.jit(single._delays)(y)
tau = np.asarray(tau, dtype=np.float64)
X = np.asarray(batch._X[k], dtype=np.float64)
h = batch.h

dv = np.abs(np.asarray(out_m["vel"][k]) - np.asarray(ref["vel"]))
for b, w in np.argwhere(dv > 1e-5):
    fl_m = np.asarray(out_m["flags"][k][b, w])
    fl_s = np.asarray(ref["flags"][b, w])
    t = tau[b, w]
    def trimmed_obj(keep):
        wgt = (~keep).astype(np.float64)  # keep: flags True = dropped
        Xw = X * wgt[:, None]
        s, *_ = np.linalg.lstsq(Xw, t * wgt, rcond=None)
        r2 = (t - X @ s) ** 2
        return np.sort(r2)[:h].sum(), s
    om, sm = trimmed_obj(fl_m)
    os_, ss = trimmed_obj(fl_s)
    print(f"band={b} win={w}: obj_merged={om:.6e} obj_single={os_:.6e} "
          f"rel gap={(om - os_) / max(om, os_):+.2e}")
    print(f"  flags_m={np.where(fl_m)[0]} flags_s={np.where(fl_s)[0]}")
    print(f"  vel_m={out_m['vel'][k][b, w]:.6f} vel_s={ref['vel'][b, w]:.6f}")
