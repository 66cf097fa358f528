"""Large-array LTS validation (VERDICT r1 item 8).

Round-1 tests stopped at 8 channels (P = C(8,2) = 28 delay equations);
production arrays go to 12-16+ elements where the LTS machinery switches
regimes: candidate subsampling (C(16,2)=120 pairs -> C(120,2)=7140 elemental
2-subsets > max_lts_candidates), chunked candidate sweeps
(``candidate_chunk``), the FAST-LTS funnel (``funnel_k``), and bf16
``xcorr_lag_tile``.
"""

import numpy as np
import pytest

from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.models.narrowband import NarrowBandPipeline
from narrow_band_least_squares_tpu.ops import lts as LTS
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import (
    get_freqlist,
    get_winlenlist,
    make_plan,
)

BAZ = 285.0
VEL = 0.33


def _build(nchans, outliers=(), duration_s=160.0, seed=5):
    st = synthetic_plane_wave(
        nchans=nchans, duration_s=duration_s, fs=10.0, baz_deg=BAZ,
        trace_vel_kms=VEL, f0=0.6, bandwidth=0.8, snr=12.0,
        aperture_km=3.0, seed=seed, outlier_channels=outliers,
    )
    freqlist, nbands, _ = get_freqlist(0.3, 1.2, "log", 2)
    winlens = get_winlenlist("constant", nbands, 30, 0, 0)
    plan = make_plan(freqlist, "log", winlens, 0.5, st.npts, st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    return st, plan, rij


def _element_flag_counts(flags, pairs, nchans):
    counts = np.zeros(nchans)
    for p, (i, j) in enumerate(pairs):
        c = int(np.asarray(flags[..., p]).sum())
        counts[i] += c
        counts[j] += c
    return counts


class TestP66:
    """12 elements -> P=66 pairs, C(66,2)=2145 exact candidates."""

    def test_recovers_event_and_flags_outliers(self):
        st, plan, rij = _build(12, outliers=(3, 9))
        pipe = NarrowBandPipeline(plan, rij, alpha=0.7)
        out = {k: np.asarray(v) for k, v in pipe.run_raw(st.data).items()}
        good = out["mdccm"] > 0.4
        assert good.sum() > 5
        d = np.abs((out["baz"][good] - BAZ + 180.0) % 360.0 - 180.0)
        assert np.median(d) < 4.0
        assert abs(np.median(out["vel"][good]) - VEL) < 0.03
        counts = _element_flag_counts(out["flags"], pipe.pairs_np, 12)
        worst2 = set(np.argsort(counts)[-2:])
        assert worst2 == {3, 9}

    def test_candidate_chunk_equals_unchunked(self):
        st, plan, rij = _build(12, outliers=(3,))
        full = NarrowBandPipeline(plan, rij, alpha=0.75)
        chunked = NarrowBandPipeline(
            plan, rij, alpha=0.75, lts_candidate_chunk=256,
        )
        a = {k: np.asarray(v) for k, v in full.run_raw(st.data).items()}
        b = {k: np.asarray(v) for k, v in chunked.run_raw(st.data).items()}
        np.testing.assert_allclose(a["vel"], b["vel"], rtol=1e-6, atol=1e-6)
        assert (a["flags"] == b["flags"]).all()

    def test_funnel_matches_exact_on_clean_windows(self):
        st, plan, rij = _build(12, outliers=(3,))
        exact = NarrowBandPipeline(plan, rij, alpha=0.75)
        funnel = NarrowBandPipeline(plan, rij, alpha=0.75, lts_funnel_k=32)
        a = {k: np.asarray(v) for k, v in exact.run_raw(st.data).items()}
        b = {k: np.asarray(v) for k, v in funnel.run_raw(st.data).items()}
        good = a["mdccm"] > 0.4
        np.testing.assert_allclose(
            a["vel"][good], b["vel"][good], rtol=5e-3, atol=5e-3,
        )
        assert (a["flags"][good] == b["flags"][good]).mean() > 0.98

    def test_funnel_auto_resolution_and_safety(self):
        """lts_funnel_k='auto' resolves to max(16, ceil(Q/24)) and keeps
        confident-window results within the measured production bound
        (conf-window vel dev < 0.01 km/s; BENCH_LTS_FUNNEL.json — the
        measured worst case is 2.9e-4 on dense50, exact elsewhere)."""
        st, plan, rij = _build(12, outliers=(3,))
        auto = NarrowBandPipeline(plan, rij, alpha=0.75, lts_funnel_k="auto")
        Q = auto._cand.shape[0]
        assert auto.lts_funnel_k == max(16, -(-Q // 24))
        exact = NarrowBandPipeline(plan, rij, alpha=0.75)
        a = {k: np.asarray(v) for k, v in exact.run_raw(st.data).items()}
        b = {k: np.asarray(v) for k, v in auto.run_raw(st.data).items()}
        good = a["mdccm"] > 0.6
        assert good.sum() >= 15
        assert np.max(np.abs(a["vel"][good] - b["vel"][good])) < 0.01
        # OLS mode: 'auto' resolves to 0 (no LTS sweep exists)
        ols = NarrowBandPipeline(plan, rij, alpha=1.0, lts_funnel_k="auto")
        assert ols.lts_funnel_k == 0


class TestP120Subsampled:
    """16 elements -> P=120 pairs; C(120,2)=7140 > max_lts_candidates=4096
    exercises the fixed-seed candidate subsampling path."""

    def test_subsampling_kicks_in(self):
        _, _, rij = _build(16)
        from narrow_band_least_squares_tpu.utils.geometry import coarray
        X, pairs = coarray(rij)
        assert X.shape[0] == 120
        cinfo = LTS.precompute_candidates(X, max_candidates=4096)
        assert cinfo["cand"].shape[0] == 4096

    def test_subsampling_is_deterministic(self):
        _, _, rij = _build(16)
        from narrow_band_least_squares_tpu.utils.geometry import coarray
        X, _ = coarray(rij)
        a = LTS.precompute_candidates(X, max_candidates=2048)
        b = LTS.precompute_candidates(X, max_candidates=2048)
        assert (a["cand"] == b["cand"]).all()

    def test_recovers_event_with_chunk_and_funnel(self):
        st, plan, rij = _build(16, outliers=(11,), duration_s=120.0)
        pipe = NarrowBandPipeline(
            plan, rij, alpha=0.75,
            max_lts_candidates=2048, lts_candidate_chunk=512,
            lts_funnel_k=64,
        )
        out = {k: np.asarray(v) for k, v in pipe.run_raw(st.data).items()}
        good = out["mdccm"] > 0.4
        assert good.sum() > 3
        d = np.abs((out["baz"][good] - BAZ + 180.0) % 360.0 - 180.0)
        assert np.median(d) < 4.0
        assert abs(np.median(out["vel"][good]) - VEL) < 0.03
        counts = _element_flag_counts(
            out["flags"][good], pipe.pairs_np, 16
        )
        assert counts.argmax() == 11

    def test_full_enumeration_is_default(self):
        _, plan, rij = _build(16)
        pipe = NarrowBandPipeline(plan, rij, alpha=0.75)
        assert pipe._cand.shape[0] == 7140          # all C(120,2)
        assert pipe.lts_candidate_chunk == 4096     # auto memory bound

    def test_subsampled_matches_full_enumeration(self):
        """VERDICT r3 item 5: measure the 4096-candidate subsample against
        the full 7140-candidate enumeration at P=120.  The C-steps converge
        to the same optimum from many elemental starts, so flags and
        solutions must agree exactly on this geometry."""
        st, plan, rij = _build(16, outliers=(11,), duration_s=120.0)
        full = NarrowBandPipeline(plan, rij, alpha=0.75)
        sub = NarrowBandPipeline(plan, rij, alpha=0.75,
                                 max_lts_candidates=4096)
        a = {k: np.asarray(v) for k, v in full.run_raw(st.data).items()}
        b = {k: np.asarray(v) for k, v in sub.run_raw(st.data).items()}
        assert (a["flags"] == b["flags"]).all()
        np.testing.assert_array_equal(a["vel"], b["vel"])
        np.testing.assert_array_equal(a["baz"], b["baz"])

    def test_run_to_run_determinism(self):
        st, plan, rij = _build(16, outliers=(11,), duration_s=120.0)
        kw = dict(alpha=0.75, max_lts_candidates=2048,
                  lts_candidate_chunk=512, lts_funnel_k=64)
        a = {k: np.asarray(v) for k, v in
             NarrowBandPipeline(plan, rij, **kw).run_raw(st.data).items()}
        b = {k: np.asarray(v) for k, v in
             NarrowBandPipeline(plan, rij, **kw).run_raw(st.data).items()}
        np.testing.assert_array_equal(a["vel"], b["vel"])
        np.testing.assert_array_equal(a["flags"], b["flags"])


class TestOracleParityP66:
    def test_matches_oracle_lts(self):
        """Exact-enumeration LTS vs the CPU oracle at 12 channels."""
        from narrow_band_least_squares_tpu.oracle.ltsva import (
            filter_and_taper, sliding_window_solve,
        )

        st, plan, rij = _build(12, outliers=(3,), duration_s=120.0)
        lo, hi = plan.edges(0)
        filtered, _ = filter_and_taper(
            st.data, st.fs, "cheby1", lo, hi, 2, 0.01
        )
        ref = sliding_window_solve(
            filtered, rij, st.fs, st.start_epoch,
            plan.windows[0].winlensamp / st.fs, 0.5, 0.75,
        )
        pipe = NarrowBandPipeline(plan, rij, alpha=0.75, c_steps=10)
        out = {k: np.asarray(v) for k, v in pipe.run_raw(st.data).items()}
        n = len(ref["vel"])
        good = ref["mdccm"] > 0.4
        np.testing.assert_allclose(
            out["vel"][0, :n][good], ref["vel"][good], rtol=0, atol=5e-3,
        )
        match = (out["flags"][0, :n][good] == ref["flags"][good]).mean()
        assert match > 0.97
