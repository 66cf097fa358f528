"""Sweep the cost-based bucketing slack on the canonical + dense50 OLS step.

The cost model (ops.windows.bucket_by_cost) trades padded-matmul waste
against per-bucket fixed program overhead; `slack` is where the line is
drawn.  This sweep measures the real trade on TPU.
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
    workloads = (("canonical8", 8), ("dense50", 50))
    if "--dense-only" in sys.argv:
        workloads = (("dense50", 50),)
    for name, nbl in workloads:
        fl, nb, _ = get_freqlist(0.1, 5.0, "log", nbl)
        wl = get_winlenlist("adaptive", nb, 50, 60, 30)
        plan = make_plan(fl, "log", wl, 0.5, st.npts, st.fs)
        row = {}
        # dense50 at slack<=1.02 produces a program too large for the
        # remote-compile transport (HTTP 413) — skip the extreme point
        slacks = (1.02, 1.08, 1.3, 2.5) if nbl == 8 else (1.08, 1.3, 2.5)
        for slack in slacks:
            pipe = NarrowBandPipeline(
                plan, rij, filter_type="cheby1", alpha=1.0,
                bucket_slack=slack,
            )
            nbk = len(pipe._buckets)
            t = bench(pipe, x, n_chain=10 if nbl == 8 else 5,
                      repeats=5 if nbl == 8 else 3)
            row[str(slack)] = {"step_ms": t * 1e3, "n_buckets": nbk}
            print(name, slack, json.dumps(row[str(slack)]), flush=True)
        report[name] = row
    path = "BENCH_BUCKET_SLACK.json"
    try:
        with open(path) as f:
            merged = json.load(f)
    except FileNotFoundError:
        merged = {}
    merged.update(report)
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
