"""Perf-regression smoke gates (VERDICT r3 item 9).

The bench numbers themselves need the TPU, but the failure modes that
produced past regressions are visible in the compiled program on CPU:

- the round-2 dense50 / multi-array collapse showed up as temp memory
  blowing up superlinearly when the (B, W, P, nlag) correlation tensor
  (or its A-merged variant) materializes un-chunked — gated here via
  XLA's memory_analysis on byte budgets ~2x today's values;
- extra collectives sneaking into the sharded step (the design claim is
  ONE halo collective-permute, zero band-axis communication) — gated by
  auditing the optimized HLO of the (2, 4) mesh program.

Budgets are per-compile-backend (CPU here) and deliberately loose; they
catch order-of-magnitude structure regressions, not percent drifts.
"""

import os
import re
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import (
    get_freqlist,
    get_winlenlist,
    make_plan,
)

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "benchmarks")
)
from collectives_audit import audit_hlo  # noqa: E402


@pytest.fixture(scope="module")
def canonical():
    st = synthetic_plane_wave(
        nchans=8, duration_s=1200.0, fs=20.0, baz_deg=230.0,
        trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0, seed=42,
    )
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    return st, rij


def _compile_step(pipe, st):
    x = jnp.zeros((st.nchans, st.npts), jnp.float32)
    return jax.jit(pipe._make_step()).lower(x).compile()


def _plan(st, nbands):
    fl, nb, _ = get_freqlist(0.1, 5.0, "log", nbands)
    wl = get_winlenlist("adaptive", nb, 50, 60, 30)
    return make_plan(fl, "log", wl, 0.5, st.npts, st.fs)


def test_canonical_step_memory_budget(canonical):
    """Canonical OLS step: temp memory and logical bytes stay bounded
    (measured 2026-08: temp 180 MB, bytes 1.70 GB on the CPU backend)."""
    st, rij = canonical
    pipe = NarrowBandPipeline(_plan(st, 8), rij, alpha=1.0)
    comp = _compile_step(pipe, st)
    ma = comp.memory_analysis()
    assert ma.temp_size_in_bytes < 400e6, (
        f"temp {ma.temp_size_in_bytes/1e6:.0f} MB — cc tensor (or another "
        "stage) is materializing un-chunked; check xcorr_chunk_mb/"
        "xcorr_lag_tile defaults"
    )
    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    assert float(ca.get("bytes accessed", 0.0)) < 3.5e9


def test_dense_sweep_memory_budget(canonical):
    """Dense band sweep (20 bands keeps the CPU compile fast): the cc
    tensor budget must scale ~linearly with bands, not superlinearly
    (measured 2026-08: temp 445 MB, bytes 4.64 GB)."""
    st, rij = canonical
    pipe = NarrowBandPipeline(_plan(st, 20), rij, alpha=1.0)
    comp = _compile_step(pipe, st)
    ma = comp.memory_analysis()
    assert ma.temp_size_in_bytes < 1.0e9
    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    assert float(ca.get("bytes accessed", 0.0)) < 9e9


def test_chunking_knobs_active_by_default(canonical):
    """The two cc-tensor guards ship on: band chunking bounds per-chunk
    bytes and lag tiling prevents full materialization."""
    st, rij = canonical
    pipe = NarrowBandPipeline(_plan(st, 8), rij, alpha=1.0)
    assert pipe.xcorr_chunk_bytes > 0
    assert pipe.xcorr_lag_tile > 0


def test_sharded_step_collectives(canonical):
    """(2, 4) mesh: exactly one collective (the left-halo ppermute) in the
    optimized sharded step; the band axis is zero-communication."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from narrow_band_least_squares_tpu.parallel import (
        ShardedNarrowBandPipeline, make_mesh,
    )
    from narrow_band_least_squares_tpu.parallel.mesh import TIME_AXIS

    st, rij = canonical
    plan = _plan(st, 8)
    mesh = make_mesh(2, 4)
    pipe = ShardedNarrowBandPipeline(plan, rij, mesh, alpha=1.0)
    segs = np.tile(
        st.data[None, :, : plan.npts], (2, 1, 1)
    ).astype(np.float32)
    x = jax.device_put(segs, NamedSharding(mesh, P(TIME_AXIS, None, None)))
    hlo = jax.jit(pipe._build_sharded_step()).lower(
        x, pipe._consts
    ).compile().as_text()
    colls = audit_hlo(hlo)
    ops = [c["op"] for c in colls]
    assert ops.count("collective-permute") == 1, colls
    assert not [o for o in ops if o != "collective-permute"], colls
