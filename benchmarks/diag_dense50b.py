"""Sweep xcorr_chunk_mb on the dense50 workload (and sanity the canonical).

Picks the default band-chunk byte budget for the v5e tiling-cliff fix.
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
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    x = jax.device_put(np.asarray(st.data, np.float32))

    def bench(nbands, mb, n_iters=5):
        fl, nb, _ = get_freqlist(0.1, 5.0, "log", nbands)
        wl = get_winlenlist("adaptive", nb, 50, 60, 30)
        plan = make_plan(fl, "log", wl, 0.5, st.npts, st.fs)
        pipe = NarrowBandPipeline(
            plan, rij, filter_type="cheby1", alpha=1.0, xcorr_chunk_mb=mb,
        )
        step = jax.jit(pipe._make_step())
        out = step(x)
        jax.block_until_ready(out["vel"])
        return _timed(lambda: step(x), iters=n_iters) * 1e3

    report = {}
    for mb in (0, 16, 32, 64, 128, 256):
        ms = bench(50, mb)
        report[f"dense50 mb={mb}"] = ms
        print(f"dense50 mb={mb}: {ms:.2f} ms", flush=True)
    for mb in (0, 64):
        ms = bench(8, mb, n_iters=10)
        report[f"canonical mb={mb}"] = ms
        print(f"canonical mb={mb}: {ms:.2f} ms", flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
