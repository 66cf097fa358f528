"""Head-to-head: fused Pallas icorr+argmax kernel vs bucketed MXU xcorr.

Round-1 verdict: pallas lost 19.7 ms vs 8.8 ms because the inverse-DFT
table re-streamed per 128-row tile (docs/architecture.md).  Round 2 sizes
tile_rows to the VMEM budget (ops/kernels/xcorr_peak._pick_tiles); this
script re-runs the comparison on the canonical and dense-50-band workloads
and records the verdict for docs/architecture.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chained(step, x, n_chain=10, repeats=5):
    import jax
    import jax.numpy as jnp

    def f(a):
        def body(i, acc):
            out = step(a + acc * 1e-20)
            return acc + jnp.sum(out["vel"])

        return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0))

    g = jax.jit(f)
    jax.block_until_ready(g(x))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(g(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n_chain


def main():
    import jax.numpy as jnp

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
    x = jnp.asarray(st.data, jnp.float32)

    report = {}
    for nbands, tag in ((8, "canonical"), (50, "dense50")):
        fl, nb, _ = get_freqlist(0.1, 5.0, "log", nbands)
        wl = get_winlenlist("adaptive", nb, 50, 60, 30)
        plan = make_plan(fl, "log", wl, 0.5, st.npts, st.fs)
        row = {}
        for method in ("mxu", "pallas"):
            pipe = NarrowBandPipeline(
                plan, rij, alpha=1.0, xcorr_method=method,
            )
            t = chained(pipe._make_step(), x, n_chain=10 if nbands == 8 else 5)
            row[method + "_ms"] = t * 1e3
            print(f"{tag} {method}: {t * 1e3:.2f} ms", flush=True)
        row["pallas_speedup"] = row["mxu_ms"] / row["pallas_ms"]
        report[tag] = row

    with open("BENCH_PALLAS.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
