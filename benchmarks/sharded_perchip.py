"""Per-chip cost of the band-sharded (nb>1) slot-bucket program, on real TPU.

VERDICT r2 item 3: the slot-bucketed gather program (parallel/sharded.py
``_mode == "bucket"``) is the per-chip program every band-sharded mesh runs,
but it had only ever executed on virtual CPU devices.  This bench compiles
the exact nb=2 and nb=4 program shapes on the single available chip via the
virtual-mesh oracle path (``mesh=None, mesh_shape=(1, nb)`` ->
``_seg_step_jit``, the same seg_step an (nt, nb) mesh runs per shard but
evaluated whole-band) and times them against the nb==1 optimized-core
program on the identical halo-extended workload.

Methodology matches bench.py: chained steps inside one jit, min over
repeats, dispatch latency excluded.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chained_time(step_fn, args, n_chain=10, repeats=5):
    import jax
    import jax.numpy as jnp

    def chained(*a):
        def body(i, acc):
            out = step_fn(a[0] + acc * 1e-20, *a[1:])
            return acc + jnp.sum(out["vel"])

        return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0))

    f = jax.jit(chained)
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n_chain


def chained_time_fitted(step_fn, args, n_lo=10, n_hi=100, repeats=3):
    """Two-point fit removing the per-invocation RPC overhead
    (bench.fit_chain): overhead/n_chain otherwise inflates every step
    AND biases overhead ratios toward 1."""
    from bench import fit_chain

    t_lo = chained_time(step_fn, args, n_chain=n_lo, repeats=repeats)
    t_hi = chained_time(step_fn, args, n_chain=n_hi, repeats=repeats)
    return fit_chain(t_lo, t_hi, n_lo, n_hi)[0]


def main():
    import jax
    import jax.numpy as jnp

    from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
    from narrow_band_least_squares_tpu.parallel.sharded import (
        ShardedNarrowBandPipeline,
    )
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    st = synthetic_plane_wave(
        nchans=8, duration_s=1200.0, fs=20.0, baz_deg=230.0,
        trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0, seed=42,
    )
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    segments = st.data[None]  # (S=1, C, Tseg)

    report = {"device": str(jax.devices()[0]),
              "workload": "halo-extended single segment; canonical 8-band "
                          "(band sharding anti-pattern, kept for the "
                          "record) + dense50 (its target regime)"}
    jobs = []
    for wname, nbr in (("canonical", 8), ("dense50", 50)):
        freqlist, nbands, _ = get_freqlist(0.1, 5.0, "log", nbr)
        winlens = get_winlenlist("adaptive", nbands, 50, 60, 30)
        plan = make_plan(freqlist, "log", winlens, 0.5, st.npts, st.fs)
        jobs.append((wname, plan, (1.0, "ols") if nbr > 8 else None))

    for wname, plan, only in jobs:
        alphas = [only] if only else [(1.0, "ols"), (0.75, "lts")]
        for alpha, tag in alphas:
            res = {}
            t_core = None
            nb_list = (1, 2, 4) if wname == "canonical" else (1, 2, 5)
            for nb in nb_list:
                pipe = ShardedNarrowBandPipeline(
                    plan, rij, mesh=None, mesh_shape=(1, nb),
                    filter_type="cheby1", alpha=alpha,
                )
            # identical halo-extended input for every nb (halo = impulse len)
                halo = pipe.halo
                S, C, Tseg = segments.shape
                x_ext = np.zeros((S, C, halo + Tseg), dtype=np.float32)
                x_ext[:, :, halo:] = segments
                xj = jnp.asarray(x_ext)
                t = chained_time_fitted(
                    lambda a, c: pipe._seg_step_jit(a, c),
                    (xj, pipe._consts),
                    n_lo=10 if wname == "canonical" else 5,
                    n_hi=100 if wname == "canonical" else 50,
                )
                if nb == 1:
                    t_core = t
                res[f"nb{nb}"] = {
                    "mode": pipe._mode,
                    "step_ms": t * 1e3,
                    "overhead_vs_core_pct": 100.0 * (t / t_core - 1.0),
                }
                print(wname, tag, f"nb={nb}", json.dumps(res[f"nb{nb}"]),
                      flush=True)
            key = tag if wname == "canonical" else f"{wname}_{tag}"
            report[key] = res

    # merge into the existing parity artifact
    path = "BENCH_SHARDED_PARITY.json"
    try:
        with open(path) as f:
            full = json.load(f)
    except FileNotFoundError:
        full = {}
    full["band_sharded_perchip"] = report
    with open(path, "w") as f:
        json.dump(full, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
