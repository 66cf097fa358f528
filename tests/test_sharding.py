"""Multi-device sharding tests on the 8-virtual-device CPU mesh.

Checks (SURVEY §7.5): the shard_map'd pipeline runs over a (time, band)
mesh, matches the unsharded sequential path bitwise-comparably, and the halo
exchange reproduces warm IIR state across segment cuts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.parallel import (
    ShardedNarrowBandPipeline,
    auto_mesh_shape,
    make_mesh,
)
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import (
    get_freqlist,
    get_winlenlist,
    make_plan,
)


@pytest.fixture(scope="module")
def long_stream():
    return synthetic_plane_wave(
        nchans=4, duration_s=1600.0, fs=10.0, baz_deg=310.0,
        trace_vel_kms=0.32, f0=0.6, bandwidth=0.8, snr=8.0, seed=21,
    )


def _build(long_stream, alpha, nt, nb, seg_s=200.0, **kw):
    st = long_stream
    freqlist, nbands, _ = get_freqlist(0.2, 1.6, "log", 4)
    winlens = get_winlenlist("adaptive", nbands, 30, 40, 20)
    Tseg = int(seg_s * st.fs)
    plan = make_plan(freqlist, "log", winlens, 0.5, Tseg, st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    mesh = make_mesh(nt, nb)
    pipe = ShardedNarrowBandPipeline(
        plan, rij, mesh, filter_type="cheby1", alpha=alpha, **kw,
    )
    segs = pipe.segment_stream(st.data)
    return pipe, segs


def test_devices_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


def test_auto_mesh_shape():
    # dense sweeps: band-shard as long as >= 6 bands stay per shard
    assert auto_mesh_shape(8, nbands=48) == (1, 8)
    assert auto_mesh_shape(8, nbands=50) == (4, 2)
    # few bands per shard pads slot templates -> prefer time sharding
    assert auto_mesh_shape(8, nbands=4) == (8, 1)
    assert auto_mesh_shape(8, nbands=3) == (8, 1)
    assert auto_mesh_shape(4, nbands=8) == (4, 1)
    assert auto_mesh_shape(4, nbands=24) == (1, 4)


class TestShardedEqualsSequential:
    def test_ols(self, long_stream):
        pipe, segs = _build(long_stream, alpha=1.0, nt=2, nb=4)
        sharded = pipe.run(segs)
        seq = pipe.run_reference_sequential(segs)
        for k in ("vel", "baz", "mdccm", "sig_tau"):
            np.testing.assert_allclose(
                sharded[k], seq[k], rtol=1e-5, atol=1e-5,
                err_msg=f"{k} mismatch sharded vs sequential",
            )

    def test_lts(self, long_stream):
        pipe, segs = _build(long_stream, alpha=0.75, nt=2, nb=4)
        sharded = pipe.run(segs)
        seq = pipe.run_reference_sequential(segs)
        np.testing.assert_allclose(sharded["vel"], seq["vel"], rtol=1e-4, atol=1e-4)
        # flag tensors EXACTLY identical: tau is integer-derived and the
        # candidate sweep sits behind optimization barriers, so the LTS
        # selections are program-shape independent (ops/lts.py:178)
        assert (sharded["flags"] == seq["flags"]).all()

    def test_time_only_mesh(self, long_stream):
        pipe, segs = _build(long_stream, alpha=1.0, nt=8, nb=1)
        sharded = pipe.run(segs)
        seq = pipe.run_reference_sequential(segs)
        np.testing.assert_allclose(sharded["vel"], seq["vel"], rtol=1e-5, atol=1e-5)

    def test_band_only_mesh(self, long_stream):
        pipe, segs = _build(long_stream, alpha=1.0, nt=1, nb=4)
        sharded = pipe.run(segs)
        seq = pipe.run_reference_sequential(segs)
        np.testing.assert_allclose(sharded["vel"], seq["vel"], rtol=1e-5, atol=1e-5)


class TestHalo:
    def test_halo_warms_filter_state(self, long_stream):
        """Segment k>0 with halo must match filtering the continuous stream."""
        pipe, segs = _build(long_stream, alpha=1.0, nt=2, nb=4)
        out = pipe.run(segs)
        # recompute segment 1's result from the *continuous* stream by
        # filtering a window that includes true history
        seq = pipe.run_reference_sequential(segs)
        np.testing.assert_allclose(out["vel"][1], seq["vel"][1], rtol=1e-5, atol=1e-5)
        assert pipe.halo > 0

    def test_results_physical(self, long_stream):
        pipe, segs = _build(long_stream, alpha=1.0, nt=2, nb=4)
        out = pipe.run(segs)
        good = out["mdccm"] > 0.6
        assert good.sum() > 0
        baz = out["baz"][good]
        d = np.abs((baz - 310.0 + 180.0) % 360.0 - 180.0)
        assert np.median(d) < 5.0


class TestOptimizedShardedPath:
    """Round-2 plumbing: the sharded step runs the single-chip optimizations
    (slot bucketing, lag caps, fast mode, LTS funnel) — VERDICT item 1."""

    def test_band_sharded_uses_slot_buckets(self, long_stream):
        pipe, segs = _build(long_stream, alpha=1.0, nt=2, nb=4)
        assert pipe._mode == "bucket"
        sharded = pipe.run(segs)
        seq = pipe.run_reference_sequential(segs)
        for k in ("vel", "baz", "mdccm", "sig_tau"):
            np.testing.assert_allclose(
                sharded[k], seq[k], rtol=1e-5, atol=1e-5, err_msg=k
            )

    def test_band_sharded_unequal_slots(self, long_stream):
        # nb=2 -> B_loc=2 slots per shard with different window lengths:
        # exercises the cross-shard template-shape max
        pipe, segs = _build(long_stream, alpha=1.0, nt=2, nb=2)
        assert pipe._mode == "bucket"
        sharded = pipe.run(segs)
        seq = pipe.run_reference_sequential(segs)
        np.testing.assert_allclose(
            sharded["vel"], seq["vel"], rtol=1e-5, atol=1e-5
        )

    def test_time_only_mesh_reuses_base_core(self, long_stream):
        pipe, segs = _build(long_stream, alpha=1.0, nt=8, nb=1)
        assert pipe._mode == "core"
        assert pipe.base.bucket_bands  # the single-chip fast path is active
        sharded = pipe.run(segs)
        seq = pipe.run_reference_sequential(segs)
        np.testing.assert_allclose(
            sharded["vel"], seq["vel"], rtol=1e-5, atol=1e-5
        )

    def test_cold_segment_matches_single_chip_pipeline(self, long_stream):
        """Segment 0 (zero halo = cold start) must match NarrowBandPipeline
        on the same raw segment within cross-kernel tolerance."""
        from narrow_band_least_squares_tpu.models.narrowband import (
            NarrowBandPipeline,
        )
        pipe, segs = _build(long_stream, alpha=1.0, nt=2, nb=4)
        out = pipe.run(segs)
        base = NarrowBandPipeline(
            pipe.plan, pipe.base.rij, filter_type="cheby1", alpha=1.0
        )
        ref = {k: np.asarray(v) for k, v in base.run_raw(segs[0]).items()}
        good = ref["mdccm"] > 0.5
        np.testing.assert_allclose(
            out["vel"][0][good], ref["vel"][good], rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            out["baz"][0][good], ref["baz"][good], rtol=1e-3, atol=1e-2
        )

    def test_band_limit_db(self, long_stream):
        """band_limit_db plumbs into the slot-bucket tables; sharded must
        still equal its sequential oracle exactly, and stay close to the
        full-bin physics."""
        pipe, segs = _build(
            long_stream, alpha=1.0, nt=2, nb=4, band_limit_db=40.0,
        )
        # the bucket tables actually shrank
        K_full = max(
            bk["Lg"] + 1 for bk in pipe._slot_buckets
        )
        assert any(
            t["Cf"].shape[1] < K_full for t in pipe._bucket_tables
        )
        sharded = pipe.run(segs)
        seq = pipe.run_reference_sequential(segs)
        np.testing.assert_allclose(
            sharded["vel"], seq["vel"], rtol=1e-5, atol=1e-5
        )
        good = sharded["mdccm"] > 0.6
        baz = sharded["baz"][good]
        d = np.abs((baz - 310.0 + 180.0) % 360.0 - 180.0)
        assert np.median(d) < 5.0

    def test_max_lag(self, long_stream):
        # aperture 2.04 km / 0.32 km/s -> max physical delay 6.4 s; the cap
        # must sit above it (production setting: aperture / min velocity)
        pipe, segs = _build(
            long_stream, alpha=1.0, nt=2, nb=4, max_lag_s=8.0,
        )
        sharded = pipe.run(segs)
        seq = pipe.run_reference_sequential(segs)
        np.testing.assert_allclose(
            sharded["vel"], seq["vel"], rtol=1e-5, atol=1e-5
        )
        # physical sanity on the high-coherence windows
        good = sharded["mdccm"] > 0.6
        baz = sharded["baz"][good]
        d = np.abs((baz - 310.0 + 180.0) % 360.0 - 180.0)
        assert np.median(d) < 5.0

    def test_lts_funnel_band_sharded(self, long_stream):
        """Funnel LTS under band sharding is EXACTLY the sequential
        program's answer (VERDICT r4 item 1: formerly a 0.999 tolerance
        with no justification).  tau is integer-derived and the funnel's
        objective/top-k run on fixed-tree reductions behind an
        optimization barrier (ops.lts.lts_solve), so candidate selection
        — funnel or exhaustive — cannot differ across program shapes;
        measured agreement on this workload is bitwise."""
        pipe, segs = _build(
            long_stream, alpha=0.75, nt=2, nb=4, lts_funnel_k=8,
        )
        sharded = pipe.run(segs)
        seq = pipe.run_reference_sequential(segs)
        np.testing.assert_array_equal(sharded["vel"], seq["vel"])
        np.testing.assert_array_equal(sharded["flags"], seq["flags"])

    def test_unbucketed_global_mode(self, long_stream):
        pipe, segs = _build(
            long_stream, alpha=1.0, nt=2, nb=4, bucket_bands=False,
        )
        assert pipe._mode == "global"
        sharded = pipe.run(segs)
        seq = pipe.run_reference_sequential(segs)
        np.testing.assert_allclose(
            sharded["vel"], seq["vel"], rtol=1e-5, atol=1e-5
        )
