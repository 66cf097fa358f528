"""Streaming monitor tests: segmentation, persistence, resume, assembly."""

import os

import numpy as np
import pytest

from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.models.streaming import StreamingMonitor
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import (
    get_freqlist,
    get_winlenlist,
    make_plan,
)


@pytest.fixture(scope="module")
def monitor_setup(tmp_path_factory):
    st = synthetic_plane_wave(
        nchans=4, duration_s=1000.0, fs=10.0, baz_deg=45.0,
        trace_vel_kms=0.33, f0=0.6, bandwidth=0.8, snr=10.0, seed=33,
    )
    freqlist, nbands, _ = get_freqlist(0.3, 1.5, "log", 2)
    winlens = get_winlenlist("constant", nbands, 30, 0, 0)
    plan = make_plan(freqlist, "log", winlens, 0.5, int(200 * st.fs), st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    save_dir = str(tmp_path_factory.mktemp("mon"))
    mon = StreamingMonitor(plan, rij, save_dir, freqlist, alpha=1.0)
    return st, mon, save_dir


def test_process_and_resume(monitor_setup):
    st, mon, save_dir = monitor_setup
    recs = mon.process(st)
    assert len(recs) == 5  # 1000s / 200s segments
    files = [f for f in os.listdir(save_dir) if f.endswith(".txt")]
    assert len(files) == 5
    # resume: nothing left to do
    recs2 = mon.process(st)
    assert recs2 == []
    # deleting one segment re-processes exactly that one
    os.remove(recs[2].path_txt)
    recs3 = mon.process(st)
    assert len(recs3) == 1
    assert abs(recs3[0].start_epoch - recs[2].start_epoch) < 1e-6


def test_atomic_persist_and_stray_tmp_files(monitor_setup):
    """Persistence is atomic (temp + os.replace; npz before txt), so a
    crash mid-write leaves only *.tmp debris: the resume scan and
    read_all must ignore it, and a segment with no final .txt is
    re-selected."""
    st, mon, save_dir = monitor_setup
    mon.process(st)
    before = mon.read_all()
    # simulate interrupted-write debris
    for junk in ("nbls_999.txt.tmp", "nbls_999.npz.tmp.npz"):
        with open(os.path.join(save_dir, junk), "w") as f:
            f.write("partial")
    try:
        assert mon.process(st) == []          # resume unaffected
        after = mon.read_all()
        np.testing.assert_array_equal(before[0], after[0])
        # no .tmp left behind by the real writer
        assert not any(
            f.endswith(".tmp") or f.endswith(".tmp.npz")
            for f in os.listdir(save_dir)
            if not f.startswith("nbls_999")
        )
    finally:
        for junk in ("nbls_999.txt.tmp", "nbls_999.npz.tmp.npz"):
            os.remove(os.path.join(save_dir, junk))


def test_read_all_assembles(monitor_setup):
    st, mon, save_dir = monitor_setup
    mon.process(st)
    vel, baz, mdccm, t, num = mon.read_all()
    assert vel.shape[0] == mon.plan.nbands
    assert len(num) == mon.plan.nbands
    # windows accumulate across segments and times are increasing
    for b in range(mon.plan.nbands):
        tb = t[b, : num[b]]
        assert np.all(np.diff(tb) > 0)
    good = mdccm > 0.6
    assert good.sum() > 0
    d = np.abs((baz[good] - 45.0 + 180.0) % 360.0 - 180.0)
    assert np.median(d) < 6.0


def test_sharded_monitor_matches_single(monitor_setup, tmp_path):
    st, mon, _ = monitor_setup
    from narrow_band_least_squares_tpu.parallel import make_mesh

    mesh = make_mesh(2, 2)
    mon2 = StreamingMonitor(
        mon.plan, mon.pipe.base.rij, str(tmp_path), mon.freqlist,
        alpha=1.0, mesh=mesh,
    )
    mon2.process(st)
    v1, b1, m1, t1, n1 = mon.read_all()
    v2, b2, m2, t2, n2 = mon2.read_all()
    assert n1[:len(n2)] == n2 or n1 == n2
    k = min(v1.shape[1], v2.shape[1])
    np.testing.assert_allclose(v1[:, :k], v2[:, :k], atol=2e-4)
    np.testing.assert_allclose(m1[:, :k], m2[:, :k], atol=2e-4)


def test_retry_on_transient_failure(monitor_setup, tmp_path, monkeypatch):
    """Per-segment retry (SURVEY §5): one transient failure is absorbed."""
    st, mon, _ = monitor_setup
    from narrow_band_least_squares_tpu.models.streaming import StreamingMonitor

    mon2 = StreamingMonitor(
        mon.plan, mon.pipe.base.rij, str(tmp_path), mon.freqlist,
        alpha=1.0, max_retries=1,
    )
    calls = {"async": 0, "sync": 0}
    real_async = mon2.pipe.run_extended_async
    real_sync = mon2.pipe.run_extended

    def flaky_async(x_ext):
        calls["async"] += 1
        if calls["async"] == 1:
            raise RuntimeError("transient device error")
        return real_async(x_ext)

    def counted_sync(x_ext):
        calls["sync"] += 1
        return real_sync(x_ext)

    monkeypatch.setattr(mon2.pipe, "run_extended_async", flaky_async)
    monkeypatch.setattr(mon2.pipe, "run_extended", counted_sync)
    recs = mon2.process(st)
    assert len(recs) == 5
    assert calls["sync"] == 1  # the failed batch re-ran synchronously


def test_retry_exhaustion_raises(monitor_setup, tmp_path, monkeypatch):
    st, mon, _ = monitor_setup
    from narrow_band_least_squares_tpu.models.streaming import StreamingMonitor
    import pytest as _pytest

    mon2 = StreamingMonitor(
        mon.plan, mon.pipe.base.rij, str(tmp_path), mon.freqlist,
        alpha=1.0, max_retries=1,
    )

    def always_fail(x_ext):
        raise RuntimeError("persistent device error")

    monkeypatch.setattr(mon2.pipe, "run_extended_async", always_fail)
    monkeypatch.setattr(mon2.pipe, "run_extended", always_fail)
    with _pytest.raises(RuntimeError, match="persistent"):
        mon2.process(st)


def test_overlapping_submit_no_duplicates(monitor_setup, tmp_path):
    """Regression (r4 review): segments stay in the in-flight dedupe set
    until their file exists, so re-submitting an overlapping stream while
    the writer thread lags cannot duplicate records."""
    st, mon, _ = monitor_setup
    mon2 = StreamingMonitor(
        mon.plan, mon.pipe.base.rij, str(tmp_path), mon.freqlist, alpha=1.0,
    )
    n = len(mon2.segment_starts(st))
    mon2.submit(st)
    mon2.submit(st)      # overlapping re-submit before anything persisted
    recs = mon2.flush()
    assert len(recs) == n
    assert len({r.start_epoch for r in recs}) == n
    files = [f for f in os.listdir(str(tmp_path)) if f.endswith(".txt")]
    assert len(files) == n


def test_submit_snapshots_before_return(monitor_setup, tmp_path):
    """The incremental API consumes st.data before submit() returns
    (sub-batch leftovers are snapshotted), so a caller reusing one buffer
    per feed chunk gets correct results — the review-found hazard of the
    lazy-extension rework."""
    st, mon, _ = monitor_setup
    mon2 = StreamingMonitor(
        mon.plan, mon.pipe.base.rij, str(tmp_path), mon.freqlist,
        alpha=1.0, dispatch_segments=4,
    )
    # reference: the same per-segment feed with fresh (never mutated)
    # arrays — isolates the snapshot question from halo semantics
    mon3 = StreamingMonitor(
        mon.plan, mon.pipe.base.rij, str(tmp_path / "ref"), mon.freqlist,
        alpha=1.0, dispatch_segments=4,
    )
    Tseg = mon2.plan.npts
    buf = np.empty((st.nchans, Tseg))
    nseg = st.npts // Tseg
    for k in range(nseg):
        chunk = st.data[:, k * Tseg : (k + 1) * Tseg]
        t0 = st.start_epoch + k * Tseg / st.fs
        buf[:] = chunk
        seg = type(st)(
            data=buf, fs=st.fs, start_epoch=t0,
            latitudes=st.latitudes, longitudes=st.longitudes,
        )
        mon2.submit(seg)
        buf[:] = -1e9          # clobber: must not affect queued segments
        mon3.submit(type(st)(
            data=chunk.copy(), fs=st.fs, start_epoch=t0,
            latitudes=st.latitudes, longitudes=st.longitudes,
        ))
    assert len(mon2.flush()) == nseg
    assert len(mon3.flush()) == nseg
    v3, b3, m3, t3, n3 = mon3.read_all()
    v2, b2, m2, t2, n2 = mon2.read_all()
    assert n3 == n2
    # ArrayStream keeps float64 input by reference (np.asarray no-copy),
    # so bitwise-equal results prove submit() snapshotted, not a cast copy
    np.testing.assert_array_equal(v2, v3)
    np.testing.assert_array_equal(m2, m3)


def test_bfloat16_transfer_mode(monitor_setup, tmp_path):
    """transfer_dtype='bfloat16' (half the host->device bytes; the
    monitoring loop is transfer-bound through a remote tunnel) quantizes
    only the raw input samples — confident-window results stay within the
    input-noise envelope of the exact float32 wire format."""
    st, mon, _ = monitor_setup
    mon2 = StreamingMonitor(
        mon.plan, mon.pipe.base.rij, str(tmp_path), mon.freqlist,
        alpha=1.0, transfer_dtype="bfloat16",
    )
    assert mon2.pipe.transfer_dtype.itemsize == 2
    mon2.process(st)
    v1, b1, m1, t1, n1 = mon.read_all()      # float32 wire (session fixture)
    v2, b2, m2, t2, n2 = mon2.read_all()
    assert n1 == n2
    good = (m1 > 0.6) & (m2 > 0.6)
    assert good.sum() > 10
    d = np.abs((b1[good] - b2[good] + 180.0) % 360.0 - 180.0)
    assert np.median(d) < 1.0 and d.max() < 10.0
    assert np.median(np.abs(v1[good] - v2[good])) < 0.01


def test_lts_monitor_persists_flags(monitor_setup, tmp_path):
    """LTS mode through the packed async path: flags ride as the second
    fetch and land in the per-segment npz."""
    st, mon, _ = monitor_setup
    mon2 = StreamingMonitor(
        mon.plan, mon.pipe.base.rij, str(tmp_path), mon.freqlist, alpha=0.8,
    )
    recs = mon2.process(st)
    assert len(recs) == 5
    z = np.load(recs[0].path_npz)
    flags = z["flags"]
    B, Wmax = mon.plan.nbands, mon.plan.max_windows
    P = mon2.pipe.base.pairs_np.shape[0]
    assert flags.shape == (B, Wmax, P)
    assert flags.dtype == bool
    # the npz also carries the uncertainty arrays (beyond-reference)
    assert z["vel_uncert"].shape == z["vel"].shape
    assert z["baz_uncert"].shape == z["baz"].shape

    # VERDICT r4 item 8: read_all(extras=True) reassembles the npz-only
    # quantities with the same prefix layout as the TSV arrays
    vel, baz, mdccm, t, num, ex = mon2.read_all(extras=True)
    width = vel.shape[1]
    assert ex["sig_tau"].shape == (B, width)
    assert ex["vel_uncert"].shape == (B, width)
    assert ex["baz_uncert"].shape == (B, width)
    assert ex["flags"].shape == (B, width, P)
    for b in range(B):
        n = num[b]
        assert np.isfinite(ex["sig_tau"][b, :n]).all()
        assert np.isfinite(ex["vel_uncert"][b, :n]).all()
        # concatenation matches the per-segment npz values in time order
    z0 = np.load(recs[0].path_npz)
    n0 = int(z0["num_compute"][0])
    np.testing.assert_allclose(ex["sig_tau"][0, :n0], z0["sig_tau"][0, :n0])
    np.testing.assert_array_equal(ex["flags"][0, :n0], z0["flags"][0, :n0])

    # resume-safety: a fresh monitor over the same save_dir (nothing to
    # reprocess) reads back the identical extras
    mon3 = StreamingMonitor(
        mon.plan, mon.pipe.base.rij, str(tmp_path), mon.freqlist, alpha=0.8,
    )
    assert mon3.process(st) == []
    _, _, _, _, num2, ex2 = mon3.read_all(extras=True)
    assert num2 == num
    np.testing.assert_allclose(ex2["sig_tau"], ex["sig_tau"])
    np.testing.assert_array_equal(ex2["flags"], ex["flags"])

    # missing sidecar -> NaN fill, timeline still aligned
    os.remove(recs[1].path_npz)
    _, _, _, _, num3, ex3 = mon3.read_all(extras=True)
    assert num3 == num
    n0b = int(z0["num_compute"][0])
    assert np.isfinite(ex3["sig_tau"][0, :n0b]).all()
    assert np.isnan(ex3["sig_tau"][0, n0b : n0b + 1]).any()

    # the long-duration uncertainty figure renders from these arrays
    from narrow_band_least_squares_tpu.plotting import (
        monitoring_uncertainty_plot,
    )

    fig = monitoring_uncertainty_plot(
        0.3, 1.5, B, mon.freqlist, ex["vel_uncert"], ex["baz_uncert"],
        mdccm, t, num, 0.6, flags=ex["flags"],
    )
    assert len(fig.axes) == 4  # 3 panels + colorbar
    import matplotlib.pyplot as plt

    plt.close(fig)
