"""Recorded-event golden regression (VERDICT r1 item 6).

The checked-in fixture (tests/data/, generated once by
make_golden_fixture.py) is a forward-modeled event written through the REAL
byte formats — miniSEED v2 int32 records and FDSN StationXML with full
multi-stage responses — standing in for the reference's IRIS event
(reference ``example.py:40-47``; no network egress here).  The test drives
the entire recorded-data path: native C++ miniSEED decode -> StationXML
response parse -> water-level deconvolution -> batched pipeline, and locks
the outputs against tests/data/golden.json.

Regenerate the golden after an intentional numerics change with:
    python -m pytest tests/test_golden_event.py --write-golden
"""

import json
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
GOLDEN = os.path.join(DATA, "golden.json")

NBANDS = 6
FMIN, FMAX = 0.3, 5.0
WINLEN_1, WINLEN_X = 30, 15


def _fixture_fetch(url, timeout=60.0):
    if "dataselect" in url:
        with open(os.path.join(DATA, "i53_synth_event.mseed"), "rb") as f:
            return f.read()
    if "level=response" in url:
        with open(os.path.join(DATA, "i53_synth_event.xml"), "rb") as f:
            return f.read()
    with open(os.path.join(DATA, "i53_synth_event.txt"), "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def meta():
    with open(os.path.join(DATA, "i53_synth_event_meta.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def stream(meta):
    from narrow_band_least_squares_tpu.io.fdsn import gather_waveforms_fdsn

    t0 = meta["start_epoch"]
    return gather_waveforms_fdsn(
        "IRIS", "IM", "I53H*", "", "BDF",
        t0, t0 + meta["duration_s"],
        remove_response=True, _fetch=_fixture_fetch,
    )


@pytest.fixture(scope="module")
def results(stream, meta):
    """Canonical narrow-band run (OLS + LTS) on the recorded fixture."""
    from narrow_band_least_squares_tpu.api import narrow_band_least_squares
    from narrow_band_least_squares_tpu.utils.plan import (
        get_freqlist, get_winlenlist,
    )

    freqlist, nbands, _ = get_freqlist(FMIN, FMAX, "log", NBANDS)
    winlens = get_winlenlist("adaptive", nbands, 20, WINLEN_1, WINLEN_X)
    fr = np.logspace(-2, np.log10(stream.fs / 2), 50)
    out = {}
    for alpha in (1.0, 0.75):
        out[alpha] = narrow_band_least_squares(
            winlens, 0.5, alpha, stream, stream.latitudes, stream.longitudes,
            nbands, None, None, freqlist, "log", fr, "cheby1", 2, 0.01,
        )
    out["freqlist"] = freqlist
    out["winlens"] = winlens
    return out


class TestRecordedBytesPath:
    def test_decode_shape_and_coords(self, stream, meta):
        assert stream.nchans == meta["nchans"]
        assert stream.npts == int(meta["duration_s"] * meta["fs"])
        assert stream.fs == meta["fs"]
        assert len(stream.latitudes) == meta["nchans"]
        assert np.ptp(stream.latitudes) > 0  # real per-element coords

    def test_deconvolution_restores_pressure_amplitude(self, stream, meta):
        # counts were ~sensitivity x pressure; after deconvolution the data
        # must be back at O(1 Pa), not O(10^5 counts)
        rms = np.sqrt((stream.data ** 2).mean())
        assert 0.05 < rms < 50.0


class TestEventSolution:
    def test_baz_vel_recovered(self, results, meta):
        # the fixture contains one incoherent element (like real arrays do),
        # so OLS is biased and only coarsely right ...
        vel, baz, mdccm = (
            results[1.0][0], results[1.0][1], results[1.0][2],
        )
        good = mdccm > 0.5
        assert good.sum() > 20
        d = np.abs((baz[good] - meta["baz_deg"] + 180.0) % 360.0 - 180.0)
        assert np.median(d) < 20.0
        # ... while LTS drops the outlier's pairs and recovers the event
        # precisely — the method's entire point (Bishop, Fee & Szuberla 2020)
        vel_l, baz_l, mdccm_l = (
            results[0.75][0], results[0.75][1], results[0.75][2],
        )
        good_l = mdccm_l > 0.5
        d_l = np.abs((baz_l[good_l] - meta["baz_deg"] + 180.0) % 360.0 - 180.0)
        assert np.median(d_l) < 3.0
        assert abs(
            np.median(vel_l[good_l]) - meta["trace_vel_kms"]
        ) < 0.03

    def test_lts_flags_outlier_element(self, results, meta):
        stdict = results[0.75][4]
        assert stdict is not None and stdict["size"] == meta["nchans"]
        counts = np.zeros(meta["nchans"] + 1)
        for k, v in stdict.items():
            if k == "size":
                continue
            for el in np.asarray(v).ravel():
                counts[int(el)] += 1
        assert counts.argmax() == meta["outlier_channel"] + 1

    def test_matches_cpu_oracle(self, stream, results):
        """TPU pipeline vs the NumPy/SciPy oracle on the recorded bytes."""
        from narrow_band_least_squares_tpu.oracle.pipeline import (
            narrow_band_least_squares_oracle,
        )

        freqlist, winlens = results["freqlist"], results["winlens"]
        fr = np.logspace(-2, np.log10(stream.fs / 2), 50)
        ref = narrow_band_least_squares_oracle(
            winlens, 0.5, 1.0, stream, stream.latitudes, stream.longitudes,
            NBANDS, freqlist, "log", fr, "cheby1", 2, 0.01,
        )
        vel, baz, mdccm = results[1.0][0], results[1.0][1], results[1.0][2]
        good = ref[2] > 0.5
        w = min(vel.shape[1], ref[0].shape[1])
        np.testing.assert_allclose(
            vel[:, :w][good[:, :w]], ref[0][:, :w][good[:, :w]],
            rtol=0, atol=5e-3,
        )
        np.testing.assert_allclose(
            mdccm[:, :w][good[:, :w]], ref[2][:, :w][good[:, :w]],
            rtol=0, atol=5e-3,
        )


def _summarize(results):
    vel, baz, mdccm, _, _, sig, ncl, _, _ = results[1.0]
    rows = []
    for b in range(NBANDS):
        n = ncl[b]
        g = mdccm[b, :n] > 0.5
        rows.append({
            "band": b,
            "n_windows": int(n),
            "n_good": int(g.sum()),
            "median_baz": float(np.median(baz[b, :n][g])) if g.any() else None,
            "median_vel": float(np.median(vel[b, :n][g])) if g.any() else None,
            "median_mdccm": float(np.median(mdccm[b, :n][g])) if g.any() else None,
        })
    flags = results[0.75][4]
    n_flag_keys = sum(1 for k in flags if k != "size")
    return {"bands": rows, "lts_flagged_windows": n_flag_keys}


def test_golden_regression(results, request):
    """Lock per-band medians against the committed golden.json."""
    summary = _summarize(results)
    if request.config.getoption("--write-golden"):
        with open(GOLDEN, "w") as f:
            json.dump(summary, f, indent=2)
        pytest.skip("golden rewritten")
    if not os.path.exists(GOLDEN):
        pytest.fail("tests/data/golden.json missing — run with --write-golden")
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert summary["lts_flagged_windows"] == golden["lts_flagged_windows"]
    for got, want in zip(summary["bands"], golden["bands"]):
        assert got["n_windows"] == want["n_windows"]
        assert got["n_good"] == want["n_good"], f"band {got['band']}"
        for key in ("median_baz", "median_vel", "median_mdccm"):
            if want[key] is None:
                assert got[key] is None
            else:
                assert got[key] == pytest.approx(want[key], abs=1e-6), (
                    f"band {got['band']} {key}"
                )
