"""TPU benchmark: the Pallas megakernel (xcorr_method='fused') vs staged MXU.

VERDICT r2 item 2 measurement: canonical + dense50 OLS step times and
compiled-cost bytes for the staged pipeline vs the VMEM-resident fused
kernel (ops.kernels.fused_xcorr).  Writes BENCH_FUSED.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(pipe, x, n_chain=10, repeats=5):
    import jax
    import jax.numpy as jnp

    step = pipe._make_step()

    def chained(x):
        def body(i, acc):
            out = step(x + acc * 1e-20)
            return acc + jnp.sum(out["vel"])
        return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0))

    f = jax.jit(chained)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n_chain


def cost_bytes(pipe, x):
    import jax

    try:
        compiled = jax.jit(pipe._make_step()).lower(x).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {
            "flops": float(ca.get("flops", 0.0)),
            "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
        }
    except Exception as e:
        return {"error": str(e)}


def main():
    import jax
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
    report = {"device": str(jax.devices()[0])}
    for name, nbl in (("canonical8", 8), ("dense50", 50)):
        fl, nb, _ = get_freqlist(0.1, 5.0, "log", nbl)
        wl = get_winlenlist("adaptive", nb, 50, 60, 30)
        plan = make_plan(fl, "log", wl, 0.5, st.npts, st.fs)
        row = {}
        for method in ("mxu", "fused"):
            pipe = NarrowBandPipeline(
                plan, rij, filter_type="cheby1", alpha=1.0,
                xcorr_method=method,
            )
            t = bench(pipe, x, n_chain=10 if nbl == 8 else 5,
                      repeats=5 if nbl == 8 else 3)
            row[method] = {"step_ms": t * 1e3, **cost_bytes(pipe, x)}
            print(name, method, json.dumps(row[method]), flush=True)
        # numerical cross-check on device
        rm = NarrowBandPipeline(plan, rij, alpha=1.0).run_raw(st.data)
        rf = NarrowBandPipeline(
            plan, rij, alpha=1.0, xcorr_method="fused"
        ).run_raw(st.data)
        row["max_vel_dev"] = float(
            np.abs(np.asarray(rm["vel"]) - np.asarray(rf["vel"])).max()
        )
        report[name] = row
    with open("BENCH_FUSED.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
