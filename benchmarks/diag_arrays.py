"""Diagnose the A=8 multi-array throughput collapse (BENCH_ARRAYS.json).

Times each stage of MultiArrayPipeline's step separately at several batch
sizes and dumps the compiled full-step memory analysis, to localize the
superlinear jump (10.2 ms @ A=4 -> 53.4 ms @ A=8 on v5e).
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, reps=3, iters=10):
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
    from narrow_band_least_squares_tpu.models.multiarray import MultiArrayPipeline
    from narrow_band_least_squares_tpu.ops import filters as F
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    seg_s, fs = 600.0, 20.0
    freqlist, nbands, _ = get_freqlist(0.1, 5.0, "log", 8)
    winlens = get_winlenlist("adaptive", nbands, 50, 60, 30)
    plan = make_plan(freqlist, "log", winlens, 0.5, int(seg_s * fs), fs)

    report = {}
    for A in (4, 8):
        streams = [
            synthetic_plane_wave(
                nchans=8, duration_s=seg_s, fs=fs,
                baz_deg=200.0 + 10 * k, trace_vel_kms=0.34, seed=42 + k,
            )
            for k in range(A)
        ]
        rijs = [get_rij(s.latitudes, s.longitudes, s.nchans) for s in streams]
        pipe = MultiArrayPipeline(plan, rijs, alpha=1.0)
        base = pipe.base
        data = np.stack([s.data for s in streams]).astype(np.float32)
        x = jax.device_put(data)

        filt = jax.jit(jax.vmap(
            lambda xb: F.filter_bank_fft(
                xb, base._h_bank, base._taper, base.nfft_filter,
                base.zerophase,
            )
        ))
        y = filt(x)
        jax.block_until_ready(y)

        delays = jax.jit(base._delays_batched)
        tau, rho, md = delays(y)
        jax.block_until_ready(tau)

        row = {
            "filter_ms": _timed(lambda: filt(x)) * 1e3,
            "delays_ms": _timed(lambda: delays(y)) * 1e3,
        }

        args = [x, pipe._X, pipe._pinv, pipe._XtX_inv]
        row["full_ms"] = _timed(lambda: pipe._step(*args)) * 1e3

        try:
            compiled = jax.jit(pipe._build()).lower(*args).compile()
            ma = compiled.memory_analysis()
            row["memory"] = {
                "temp_MB": ma.temp_size_in_bytes / 1e6,
                "output_MB": ma.output_size_in_bytes / 1e6,
                "argument_MB": ma.argument_size_in_bytes / 1e6,
            }
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            row["flops_G"] = float(ca.get("flops", 0)) / 1e9
            row["bytes_GB"] = float(ca.get("bytes accessed", 0)) / 1e9
        except Exception as e:
            row["analysis_error"] = str(e)
        report[f"A={A}"] = row
        print(json.dumps({f"A={A}": row}), flush=True)

    with open("/tmp/diag_arrays.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
