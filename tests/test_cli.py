"""CLI front-end smoke: defaults, run, monitor + resume."""

import json
import os

import numpy as np
import pytest

from narrow_band_least_squares_tpu.__main__ import main
from narrow_band_least_squares_tpu.config import NBLSConfig


@pytest.fixture(scope="module")
def stream_npz(tmp_path_factory, small_stream):
    p = str(tmp_path_factory.mktemp("cli") / "stream.npz")
    small_stream.save_npz(p)
    return p


@pytest.fixture(scope="module")
def cfg_json(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cfg") / "cfg.json")
    NBLSConfig(
        FMIN=0.3, FMAX=2.0, NBANDS=3, WINLEN=40, WINLEN_1=50, WINLEN_X=30
    ).to_json(p)
    return p


def test_defaults(capsys):
    main(["defaults"])
    d = json.loads(capsys.readouterr().out)
    assert d["FMIN"] == 0.1 and d["FREQ_BAND_TYPE"] == "log"


def test_run(stream_npz, cfg_json, tmp_path, capsys):
    out = str(tmp_path / "out")
    main(["run", "--data", stream_npz, "--out", out, "--no-figures",
          "--config", cfg_json])
    s = json.loads(capsys.readouterr().out)
    assert s["bands"] == 3
    assert os.path.exists(os.path.join(out, "narrow_band_results.txt"))
    assert os.path.exists(os.path.join(out, "config_used.json"))
    assert s["median_baz_deg"] == pytest.approx(230.0, abs=8.0)


def test_monitor_resume(stream_npz, cfg_json, tmp_path, capsys):
    out = str(tmp_path / "mon")
    args = ["monitor", "--data", stream_npz, "--segment-s", "120",
            "--out", out, "--config", cfg_json]
    main(args)
    n1 = json.loads(capsys.readouterr().out)["segments_processed"]
    main(args)
    n2 = json.loads(capsys.readouterr().out)["segments_processed"]
    assert n1 == 2 and n2 == 0


def test_nyquist_validation(stream_npz, tmp_path):
    # default config FMAX=5.0 on a 10 Hz stream -> clear error
    with pytest.raises(ValueError, match="Nyquist"):
        main(["run", "--data", stream_npz, "--out", str(tmp_path / "x"),
              "--no-figures"])


def test_monitor_mseed_input(small_stream, cfg_json, tmp_path, capsys):
    """monitor accepts miniSEED input decoded by the native codec."""
    pytest.importorskip("narrow_band_least_squares_tpu.native")
    from narrow_band_least_squares_tpu import native
    from tests.test_ingest import make_int32_record

    lib = native.get_lib(auto_build=True)
    if lib is None or not hasattr(lib, "nbls_mseed_scan"):
        pytest.skip("native ingest runtime unavailable")

    st = small_stream
    # int32-quantized copy of the synthetic stream as one record per chunk
    scale = 1e4
    buf = b""
    coords = {}
    for c in range(st.nchans):
        sta = f"I53H{c + 1}"
        sid = f"IM.{sta}..BDF"
        coords[sid] = [st.latitudes[c], st.longitudes[c]]
        x = (st.data[c] * scale).astype(int)
        for k in range(0, st.npts, 500):
            block = x[k : k + 500]
            secs = k / st.fs
            buf += make_int32_record(
                list(block), sta=sta, fs=int(st.fs), reclen=4096,
                mm=int(secs // 60), ss=int(secs % 60),
            )
    ms = str(tmp_path / "data.mseed")
    with open(ms, "wb") as f:
        f.write(buf)
    cj = str(tmp_path / "coords.json")
    with open(cj, "w") as f:
        json.dump(coords, f)
    out = str(tmp_path / "mon")
    main(["monitor", "--config", cfg_json, "--data", ms, "--coords", cj,
          "--segment-s", "150", "--out", out])
    rep = json.loads(capsys.readouterr().out)
    assert rep["segments_processed"] >= 1

def test_perf_overrides_roundtrip(tmp_path):
    """Perf knobs survive JSON round-trip and only non-defaults override."""
    cfg = NBLSConfig(max_lag_s=5.0, lts_funnel_k=8, lts_c_steps=6)
    p = str(tmp_path / "perf.json")
    cfg.to_json(p)
    back = NBLSConfig.from_json(p)
    assert back.perf_overrides() == {
        "max_lag_s": 5.0, "lts_funnel_k": 8, "c_steps": 6,
    }
    assert NBLSConfig().perf_overrides() == {}
    # the 'auto' band-limit survives the JSON round trip as a string
    cfg2 = NBLSConfig(band_limit_db="auto")
    p2 = str(tmp_path / "auto.json")
    cfg2.to_json(p2)
    assert NBLSConfig.from_json(p2).perf_overrides() == {
        "band_limit_db": "auto",
    }


def test_run_with_perf_config(stream_npz, tmp_path, capsys):
    """CLI applies config perf knobs via api.set_performance_defaults."""
    from narrow_band_least_squares_tpu import api

    cfgp = str(tmp_path / "cfg.json")
    NBLSConfig(
        FMIN=0.3, FMAX=2.0, NBANDS=3, WINLEN=40, WINLEN_1=50, WINLEN_X=30,
        max_lag_s=8.0, xcorr_chunk_mb=4.0,
    ).to_json(cfgp)
    out = str(tmp_path / "out")
    try:
        main(["run", "--data", stream_npz, "--out", out, "--no-figures",
              "--config", cfgp])
        s = json.loads(capsys.readouterr().out)
        assert s["median_baz_deg"] == pytest.approx(230.0, abs=8.0)
    finally:
        api.set_performance_defaults(max_lag_s=None, xcorr_chunk_mb=None)
