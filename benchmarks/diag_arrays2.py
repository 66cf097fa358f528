"""Follow-up to diag_arrays.py: test the chunked-merge hypothesis at A=8.

If processing the merged (B, A*W, ...) xcorr batch in 2 sequential chunks
of 4 arrays each restores ~2x the A=4 delays time (~20 ms instead of the
~51 ms fused-at-once time), the collapse is a size-triggered XLA
fusion/tiling cliff and auto-chunking is the fix.
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
    import jax.numpy as jnp
    import numpy as np

    from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
    from narrow_band_least_squares_tpu.models.multiarray import MultiArrayPipeline
    from narrow_band_least_squares_tpu.ops import filters as F
    from narrow_band_least_squares_tpu.utils.geometry import get_rij
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist, make_plan,
    )

    seg_s, fs, A = 600.0, 20.0, 8
    freqlist, nbands, _ = get_freqlist(0.1, 5.0, "log", 8)
    winlens = get_winlenlist("adaptive", nbands, 50, 60, 30)
    plan = make_plan(freqlist, "log", winlens, 0.5, int(seg_s * fs), fs)

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
            xb, base._h_bank, base._taper, base.nfft_filter, base.zerophase,
        )
    ))
    y = filt(x)
    jax.block_until_ready(y)

    report = {}
    for n_chunks in (1, 2, 4, 8):
        ca = A // n_chunks

        def delays_chunked(y):
            outs = [
                base._delays_batched(y[i * ca:(i + 1) * ca])
                for i in range(n_chunks)
            ]
            return tuple(jnp.concatenate(parts, axis=0)
                         for parts in zip(*outs))

        f = jax.jit(delays_chunked)
        out = f(y)
        jax.block_until_ready(out)
        ms = _timed(lambda: f(y)) * 1e3
        report[f"chunks={n_chunks}"] = ms
        print(f"chunks={n_chunks}: {ms:.2f} ms", flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
