"""Per-chip parity: sharded (1,1)-mesh step vs the single-chip pipeline.

VERDICT r1 item 1 done-criterion: on TPU, a (1,1)-mesh sharded step must be
within ~10% of ``NarrowBandPipeline``'s step time on the same workload (the
sharded path used to run unoptimized kernels and was ~2x slower per chip).

Methodology matches bench.py: chained steps inside one jit so dispatch
latency is excluded.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chained_time(step_fn, args, n_chain=10, repeats=5, probe=None):
    import jax
    import jax.numpy as jnp

    if probe is None:
        probe = lambda out: jnp.sum(out["vel"])

    def chained(*a):
        def body(i, carry):
            acc = carry
            out = step_fn(a[0] + acc * 1e-20, *a[1:])
            return acc + probe(out)

        return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0))

    f = jax.jit(chained)
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n_chain


def main():
    import jax
    import jax.numpy as jnp

    from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
    from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
    from narrow_band_least_squares_tpu.parallel import (
        ShardedNarrowBandPipeline, make_mesh,
    )
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    st = synthetic_plane_wave(
        nchans=8, duration_s=1200.0, fs=20.0, baz_deg=230.0,
        trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0, seed=42,
    )
    freqlist, nbands, _ = get_freqlist(0.1, 5.0, "log", 8)
    winlens = get_winlenlist("adaptive", nbands, 50, 60, 30)
    plan = make_plan(freqlist, "log", winlens, 0.5, st.npts, st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    x = jnp.asarray(st.data, jnp.float32)

    report = {"device": str(jax.devices()[0])}
    for alpha, tag in ((1.0, "ols"), (0.75, "lts")):
        base = NarrowBandPipeline(plan, rij, filter_type="cheby1", alpha=alpha)
        t_base = chained_time(lambda a: base._make_step()(a), (x,))

        mesh = make_mesh(1, 1)
        sh = ShardedNarrowBandPipeline(
            plan, rij, mesh, filter_type="cheby1", alpha=alpha,
        )
        segs = jnp.asarray(
            st.data[None], jnp.float32
        )  # (S=1, C, T) one segment
        consts = sh._consts
        t_sh = chained_time(
            lambda a, c: sh._step(a, c), (segs, consts),
        )
        report[tag] = {
            "single_chip_ms": t_base * 1e3,
            "sharded_1x1_ms": t_sh * 1e3,
            "overhead_pct": 100.0 * (t_sh / t_base - 1.0),
        }
        print(tag, json.dumps(report[tag]), flush=True)

    with open("BENCH_SHARDED_PARITY.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
