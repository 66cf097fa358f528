"""Is dense50 (50-band sweep, 95.9 ms) at the roofline or over the cliff?

Reports achieved HBM bandwidth + temp memory for the compiled dense50 step
and times a band-bucket-chunked variant of the delays stage to see if the
multi-array tiling cliff (fixed in multiarray.py) also affects the large
single-array band sweep.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, reps=3, iters=5):
    import jax

    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
    from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    st = synthetic_plane_wave(
        nchans=8, duration_s=1200.0, fs=20.0, baz_deg=230.0,
        trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0, seed=42,
    )
    fl50, nb50, _ = get_freqlist(0.1, 5.0, "log", 50)
    wl50 = get_winlenlist("adaptive", nb50, 50, 60, 30)
    plan50 = make_plan(fl50, "log", wl50, 0.5, st.npts, st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    pipe = NarrowBandPipeline(plan50, rij, filter_type="cheby1", alpha=1.0)
    x = jax.device_put(np.asarray(st.data, np.float32))

    report = {"buckets": len(pipe._buckets),
              "bucket_shapes": [
                  {"bands": len(b["band_idx"]),
                   "W": int(b["grid"].n_windows) if hasattr(b["grid"], "n_windows")
                   else -1}
                  for b in pipe._buckets
              ][:8]}

    step = jax.jit(pipe._make_step())
    out = step(x)
    jax.block_until_ready(out["vel"])
    t = _timed(lambda: step(x))
    report["full_ms"] = t * 1e3

    compiled = jax.jit(pipe._make_step()).lower(x).compile()
    ma = compiled.memory_analysis()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    b = float(ca.get("bytes accessed", 0))
    report["temp_MB"] = ma.temp_size_in_bytes / 1e6
    report["bytes_GB"] = b / 1e9
    report["achieved_GBps"] = b / t / 1e9
    report["flops_G"] = float(ca.get("flops", 0)) / 1e9
    report["achieved_TFLOPs"] = float(ca.get("flops", 0)) / t / 1e12

    # delays stage alone
    filt = None
    y = None
    from narrow_band_least_squares_tpu.ops import filters as F
    yf = jax.jit(lambda xx: F.filter_bank_fft(
        xx, pipe._h_bank, pipe._taper, pipe.nfft_filter, pipe.zerophase))(x)
    jax.block_until_ready(yf)
    delays = jax.jit(pipe._delays)
    o = delays(yf)
    jax.block_until_ready(o[0])
    report["delays_ms"] = _timed(lambda: delays(yf)) * 1e3

    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
