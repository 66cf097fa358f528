"""Multi-array batch pipeline: vmap correctness + mesh data sharding."""

import numpy as np
import pytest

from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.models.multiarray import MultiArrayPipeline
from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
from narrow_band_least_squares_tpu.parallel import make_mesh
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import (
    get_freqlist,
    get_winlenlist,
    make_plan,
)


@pytest.fixture(scope="module")
def arrays():
    streams = [
        synthetic_plane_wave(
            nchans=4, duration_s=240.0, fs=10.0,
            baz_deg=45.0 + 90.0 * k, trace_vel_kms=0.30 + 0.02 * k,
            f0=0.6, bandwidth=0.8, snr=10.0, seed=100 + k,
        )
        for k in range(4)
    ]
    freqlist, nbands, _ = get_freqlist(0.3, 1.5, "log", 2)
    winlens = get_winlenlist("constant", nbands, 30, 0, 0)
    plan = make_plan(freqlist, "log", winlens, 0.5, streams[0].npts, streams[0].fs)
    rijs = [get_rij(s.latitudes, s.longitudes, s.nchans) for s in streams]
    return streams, plan, rijs


def test_batch_matches_individual(arrays):
    streams, plan, rijs = arrays
    batch = MultiArrayPipeline(plan, rijs, alpha=1.0)
    data = np.stack([s.data for s in streams])
    out = batch.run_raw(data)
    for k, (s, rij) in enumerate(zip(streams, rijs)):
        single = NarrowBandPipeline(plan, rij, alpha=1.0)
        ref = single.run_raw(s.data)
        np.testing.assert_allclose(
            np.asarray(out["vel"][k]), np.asarray(ref["vel"]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["mdccm"][k]), np.asarray(ref["mdccm"]),
            rtol=1e-5, atol=1e-5,
        )


def test_batch_recovers_distinct_baz(arrays):
    streams, plan, rijs = arrays
    batch = MultiArrayPipeline(plan, rijs, alpha=1.0)
    out = batch.run_raw(np.stack([s.data for s in streams]))
    for k in range(4):
        truth = (45.0 + 90.0 * k) % 360.0
        good = np.asarray(out["mdccm"][k]) > 0.6
        baz = np.asarray(out["baz"][k])[good]
        d = np.abs((baz - truth + 180.0) % 360.0 - 180.0)
        assert np.median(d) < 6.0, f"array {k}"


def test_mesh_sharded_batch(arrays):
    streams, plan, rijs = arrays
    mesh = make_mesh(4, 1)  # arrays over the data axis
    batch = MultiArrayPipeline(plan, rijs, alpha=1.0, mesh=mesh)
    out = batch.run_raw(np.stack([s.data for s in streams]))
    ref = MultiArrayPipeline(plan, rijs, alpha=1.0).run_raw(
        np.stack([s.data for s in streams])
    )
    np.testing.assert_allclose(
        np.asarray(out["vel"]), np.asarray(ref["vel"]), rtol=1e-5, atol=1e-5
    )


def test_merge_chunking_parity(arrays):
    """Array-chunked delays (default chunk=2, the v5e tiling-cliff fix) is
    numerically identical to the fully-merged program, including a ragged
    last chunk (A=3, chunk=2)."""
    streams, plan, rijs = arrays
    data = np.stack([s.data for s in streams])
    full = MultiArrayPipeline(plan, rijs, alpha=1.0, merge_chunk_arrays=0)
    assert full.merge_chunk_arrays == 4
    ref = full.run_raw(data)
    chunked = MultiArrayPipeline(plan, rijs, alpha=1.0)  # default chunk=2
    out = chunked.run_raw(data)
    for k in ("vel", "baz", "mdccm"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-5, atol=1e-5
        )
    ragged = MultiArrayPipeline(plan, rijs[:3], alpha=1.0)
    out3 = ragged.run_raw(data[:3])
    np.testing.assert_allclose(
        np.asarray(out3["vel"]), np.asarray(ref["vel"][:3]),
        rtol=1e-5, atol=1e-5,
    )


def test_mismatched_nchans_rejected(arrays):
    streams, plan, rijs = arrays
    bad = rijs[:2] + [np.zeros((2, 6))]
    with pytest.raises(ValueError):
        MultiArrayPipeline(plan, bad)


def test_optimized_options_match_individual(arrays):
    """Round-2 plumbing: max_lag/funnel flow through run identically
    to the single-array pipeline configured the same way."""
    streams, plan, rijs = arrays
    kw = dict(alpha=0.75, max_lag_s=8.0, lts_funnel_k=4)
    batch = MultiArrayPipeline(plan, rijs, **kw)
    assert batch.base.bucket_bands
    out = batch.run_raw(np.stack([s.data for s in streams]))
    for k, (s, rij) in enumerate(zip(streams, rijs)):
        ref = NarrowBandPipeline(plan, rij, **kw).run_raw(s.data)
        np.testing.assert_allclose(
            np.asarray(out["vel"][k]), np.asarray(ref["vel"]),
            rtol=1e-5, atol=1e-5,
        )
        assert (np.asarray(out["flags"][k]) == np.asarray(ref["flags"])).all()


@pytest.mark.parametrize(
    "kw",
    [
        dict(alpha=0.75, max_lag_s=8.0),
        dict(alpha=0.75, max_lag_s=8.0, lts_funnel_k=4),
        dict(alpha=0.75, lts_funnel_k=4, subsample_delays=True),
        dict(alpha=1.0, max_lag_s=8.0, subsample_delays=True),
        dict(alpha=0.75, window_method="gather", bucket_bands=False,
             lts_funnel_k=4),
        dict(alpha=0.75, lts_funnel_k="auto", band_limit_db="auto"),
    ],
    ids=["maxlag", "funnel", "funnel-subsamp", "ols-maxlag-subsamp",
         "gather-nobucket", "production-auto"],
)
def test_perf_option_combos_match_individual(arrays, kw):
    """Merged multi-array == per-array pipeline under every perf-option
    combination (the round-2 parity break).

    Exact parity for every combo without the FAST-LTS funnel: the stage
    barriers (models/narrowband.py::_core), fixed-tree reductions
    (ops/solve.py::tree_sum_last) and top-2 exact-peak refinement
    (ops/xcorr.py) make the discrete selections program-shape independent.

    With the funnel on, selection among NEAR-DEGENERATE LTS optima (trimmed
    objectives within ~15% of each other) can still resolve either way:
    XLA contracts the 2x2-refit mul-adds into FMAs differently per program
    shape, and the one-C-step funnel ranking sits on that last-ulp noise.
    The reference's own FAST-LTS has the same property (its optimum depends
    on the random subset draw), and the BASELINE contract is "within the
    reference's LTS optimality tolerance" — so funnel combos assert a
    documented physical bound instead: vel within 5e-4 km/s, baz within
    0.1 deg.  Flags are the dropped-pair bookkeeping of whichever
    near-optimum was selected, so their parity is exactly as strong as that
    selection: asserted exact for non-funnel combos only (a stationary
    input repeats one degenerate choice on every window, so no fraction
    bound is meaningful).
    """
    streams, plan, rijs = arrays
    funnel = bool(kw.get("lts_funnel_k")) and kw.get("alpha", 1.0) < 1.0
    atol = 5e-4 if funnel else 1e-5
    batch = MultiArrayPipeline(plan, rijs, **kw)
    out = batch.run_raw(np.stack([s.data for s in streams]))
    for k, (s, rij) in enumerate(zip(streams, rijs)):
        ref = NarrowBandPipeline(plan, rij, **kw).run_raw(s.data)
        for key, tol in (("vel", atol), ("baz", 0.1 if funnel else 1e-5),
                         ("mdccm", 1e-5)):
            np.testing.assert_allclose(
                np.asarray(out[key][k]), np.asarray(ref[key]),
                rtol=1e-5, atol=tol, err_msg=f"{key} array {k}",
            )
        if "flags" in out and not funnel:
            fd = np.asarray(out["flags"][k]) != np.asarray(ref["flags"])
            assert not fd.any(), f"flags array {k}"


def test_max_lts_candidates_respected(arrays):
    """Regression (r4 review): the per-array candidate sets honor
    max_lts_candidates just like the base pipeline."""
    _, plan, rijs = arrays
    batch = MultiArrayPipeline(plan, rijs, alpha=0.75,
                               max_lts_candidates=10)
    assert batch._cand.shape[1] == 10
    assert batch.base._cand.shape[0] == 10
    full = MultiArrayPipeline(plan, rijs, alpha=0.75)
    import math
    P = batch.base.pairs_np.shape[0]
    assert full._cand.shape[1] == math.comb(P, 2)
