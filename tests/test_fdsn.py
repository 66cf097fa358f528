"""ObsPy-free FDSN client: URL construction, station-text parsing, and the
full gather path with an injected (offline) fetcher serving native-encoded
miniSEED."""

import urllib.parse

import numpy as np
import pytest

from narrow_band_least_squares_tpu.io.fdsn import (
    ChannelInfo,
    dataselect_url,
    gather_waveforms_fdsn,
    parse_station_text,
    station_url,
)

native = pytest.importorskip("narrow_band_least_squares_tpu.native")
if native.get_lib(auto_build=True) is None or not hasattr(
    native.get_lib(), "nbls_mseed_scan"
):
    pytest.skip("native ingest runtime unavailable", allow_module_level=True)


T0 = "2018-12-19T01:45:00"
T1 = "2018-12-19T02:05:00"


class TestUrls:
    def test_dataselect(self):
        u = dataselect_url("IRIS", "IM", "I53H?", "*", "BDF", T0, T1)
        assert u.startswith("https://service.iris.edu/fdsnws/dataselect/1/query?")
        q = dict(urllib.parse.parse_qsl(urllib.parse.urlparse(u).query))
        assert q["net"] == "IM" and q["sta"] == "I53H?" and q["cha"] == "BDF"
        assert q["start"] == "2018-12-19T01:45:00.000000"
        assert q["format"] == "miniseed"

    def test_station(self):
        u = station_url("IRIS", "IM", "I53H?", "", "BDF", T0, T1)
        q = dict(urllib.parse.parse_qsl(urllib.parse.urlparse(u).query))
        assert q["level"] == "channel" and q["format"] == "text"
        assert q["loc"] == "--"

    def test_explicit_base_url(self):
        u = dataselect_url("https://my.dc.example", "XX", "S", "", "BDF", T0, T1)
        assert u.startswith("https://my.dc.example/fdsnws/dataselect/1/query?")

    def test_unknown_source(self):
        with pytest.raises(ValueError):
            dataselect_url("NOPE", "XX", "S", "", "BDF", T0, T1)


STATION_TEXT = """#Network|Station|Location|Channel|Latitude|Longitude|Elevation|Depth|Azimuth|Dip|SensorDescription|Scale|ScaleFreq|ScaleUnits|SampleRate|StartTime|EndTime
IM|I53H1||BDF|64.8745|-147.8612|200.0|0.0|0.0|0.0|Chaparral|40000.0|1.0|Pa|20.0|2010-01-01T00:00:00|
IM|I53H2||BDF|64.8702|-147.8507|205.0|0.0|0.0|0.0|Chaparral|40000.0|1.0|Pa|20.0|2010-01-01T00:00:00|
"""


class TestStationText:
    def test_parse(self):
        chans = parse_station_text(STATION_TEXT)
        assert len(chans) == 2
        c = chans[0]
        assert c.sid == "IM.I53H1..BDF"
        assert c.latitude == pytest.approx(64.8745)
        assert c.longitude == pytest.approx(-147.8612)
        assert c.sensitivity == pytest.approx(40000.0)
        assert c.sample_rate == pytest.approx(20.0)

    def test_blank_and_malformed_rows_skipped(self):
        assert parse_station_text("\n# comment\nshort|row\n") == []


class TestGather:
    def test_end_to_end_offline(self):
        """gather_waveforms_fdsn over an injected fetcher: coordinates
        attached, sensitivity applied, trimmed to the request window."""
        from tests.test_ingest import make_int32_record, _epoch

        t_req0 = _epoch(2018, 353, 1, 45, 0)

        # 200 s of data per channel at 20 Hz starting 01:45:00
        counts = {}
        buf = b""
        rng = np.random.default_rng(2)
        for c, sta in enumerate(["I53H1", "I53H2"]):
            x = rng.integers(-(2 ** 20), 2 ** 20, 4000)
            counts[f"IM.{sta}..BDF"] = x
            for k in range(0, 4000, 500):
                secs = k / 20.0
                buf += make_int32_record(
                    list(x[k:k + 500]), sta=sta, fs=20, reclen=4096,
                    mm=45 + int(secs // 60), ss=int(secs % 60),
                )

        def fetch(url, timeout=0):
            return buf if "/dataselect/" in url else STATION_TEXT.encode()

        st = gather_waveforms_fdsn(
            "IRIS", "IM", "I53H?", "", "BDF",
            "2018-12-19T01:45:00", "2018-12-19T01:47:00",
            remove_response=True, _fetch=fetch,
        )
        assert st.nchans == 2
        assert st.fs == 20.0
        assert st.npts == 2400            # trimmed to the 120 s request
        assert st.start_epoch == pytest.approx(t_req0)
        assert st.latitudes[0] == pytest.approx(64.8745)
        np.testing.assert_allclose(
            st.data[0], counts["IM.I53H1..BDF"][:2400] / 40000.0
        )

    def test_gather_waveforms_falls_back_without_obspy(self, monkeypatch):
        """io.stream.gather_waveforms routes to the native client when ObsPy
        is unimportable."""
        import builtins
        import urllib.request

        from narrow_band_least_squares_tpu.io.stream import gather_waveforms
        from tests.test_ingest import make_int32_record

        real_import = builtins.__import__

        def no_obspy(name, *a, **k):
            if name.startswith("obspy"):
                raise ImportError("obspy not installed")
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", no_obspy)

        buf = b""
        for sta in ["I53H1", "I53H2"]:
            buf += make_int32_record(list(range(2400)), sta=sta, fs=20,
                                     reclen=16384)

        class FakeResp:
            def __init__(self, data):
                self._d = data
            def read(self):
                return self._d
            def __enter__(self):
                return self
            def __exit__(self, *a):
                return False

        def fake_open(req, timeout=0):
            url = req.full_url if hasattr(req, "full_url") else req
            return FakeResp(
                buf if "/dataselect/" in url else STATION_TEXT.encode()
            )

        monkeypatch.setattr(urllib.request, "urlopen", fake_open)
        st = gather_waveforms(
            "IRIS", "IM", "I53H?", "", "BDF",
            "2018-12-19T01:45:00", "2018-12-19T01:47:00",
        )
        assert st.nchans == 2 and st.npts == 2400
