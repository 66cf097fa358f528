"""Generate the checked-in recorded-event golden fixture (run once).

The reference validates against a real IRIS event (2018-12-19 Alaska meteor,
reference ``example.py:40-47``).  This environment has no network egress, so
the fixture is a *bit-faithful* stand-in: a forward-modeled synthetic event
written through the REAL byte formats — miniSEED v2 (big-endian int32,
512-byte records, blockette 1000) and FDSN StationXML with full multi-stage
responses — so the golden test exercises the native C++ miniSEED decoder,
the StationXML response parser, the frequency-domain deconvolution, and the
whole pipeline, end to end, on stable recorded bytes.

Event parameters mimic the reference analysis: 8-element I53-like array,
20 Hz BDF channels, wave from baz 151 deg at 0.36 km/s (the meteor's
published solution ballpark), plus one noisy element so LTS has something
to flag.

Outputs (committed):
    i53_synth_event.mseed   waveforms as counts
    i53_synth_event.xml     StationXML level=response
    i53_synth_event.txt     fdsnws-station text (coords + sensitivity)
    golden.json             locked per-band medians (written by the test on
                            first run via --write-golden)
"""

import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scipy import signal  # noqa: E402

from narrow_band_least_squares_tpu.io.synthetic import (  # noqa: E402
    synthetic_plane_wave,
)

HERE = os.path.dirname(os.path.abspath(__file__))

FS = 20.0
DURATION_S = 300.0
NCHANS = 8
BAZ = 151.0
VEL = 0.36
START_EPOCH = 1545183900.0  # 2018-12-19T01:45:00Z
SEED = 20181219

# instrument (same family as tests/test_response.py)
POLES = [complex(-0.1486, 0.1486), complex(-0.1486, -0.1486)]
ZEROS = [0j, 0j]
SENSOR_GAIN = 0.02
DIGITIZER_GAIN = 400000.0
COUNTS_SCALE = 50.0  # extra gain so int32 quantization is negligible
FIR = [0.25, 0.5, 0.25]


def _a0(f_norm=1.0):
    s = 2j * np.pi * f_norm
    num = np.prod([s - z for z in ZEROS])
    den = np.prod([s - p for p in POLES])
    return float(1.0 / abs(num / den))


A0 = _a0()
SENSITIVITY = SENSOR_GAIN * DIGITIZER_GAIN * COUNTS_SCALE


def forward_apply(x, fs):
    """physical -> counts through the full instrument (scipy evaluation)."""
    n = x.size
    nfft = 1 << int(np.ceil(np.log2(2 * n)))
    freqs = np.fft.rfftfreq(nfft, d=1.0 / fs)
    _, h_pz = signal.freqs_zpk(ZEROS, POLES, A0, worN=2 * np.pi * freqs)
    _, h_fir = signal.freqz(FIR, worN=freqs, fs=fs)
    h_fir = h_fir * np.exp(2j * np.pi * freqs * 0.05)
    h = h_pz * h_fir * SENSITIVITY
    return np.fft.irfft(np.fft.rfft(x, n=nfft) * h, n=nfft)[:n]


# ---------------------------------------------------------------------------
# miniSEED writing (big-endian int32, blockette 1000, 512-byte records)
# ---------------------------------------------------------------------------

def _header(net, sta, loc, cha, epoch, nsamp, fs, reclen=512):
    import datetime as dt

    t = dt.datetime.fromtimestamp(epoch, dt.timezone.utc)
    doy = t.timetuple().tm_yday
    fract = int(round(t.microsecond / 100.0))
    h = bytearray(64)
    h[0:6] = b"000001"
    h[6:7] = b"D"
    h[7:8] = b" "
    h[8:13] = sta.ljust(5).encode()
    h[13:15] = loc.ljust(2).encode()
    h[15:18] = cha.ljust(3).encode()
    h[18:20] = net.ljust(2).encode()
    struct.pack_into(">HH", h, 20, t.year, doy)
    h[24], h[25], h[26], h[27] = t.hour, t.minute, t.second, 0
    struct.pack_into(">H", h, 28, fract)
    struct.pack_into(">H", h, 30, nsamp)
    struct.pack_into(">hh", h, 32, int(fs), 1)
    h[36] = 0x02
    h[39] = 1
    struct.pack_into(">i", h, 40, 0)
    struct.pack_into(">HH", h, 44, 64, 48)
    struct.pack_into(">HH", h, 48, 1000, 0)
    h[52] = 3            # int32
    h[53] = 1            # big endian
    h[54] = 9            # 2^9 = 512
    return h


def write_mseed_int32(path, ids, counts, fs, start_epoch, reclen=512):
    per_rec = (reclen - 64) // 4
    with open(path, "wb") as f:
        for ci, sid in enumerate(ids):
            net, sta, loc, cha = sid.split(".")
            x = counts[ci]
            for k in range(0, x.size, per_rec):
                chunk = x[k:k + per_rec].astype(np.int64)
                rec = bytearray(reclen)
                rec[:64] = _header(
                    net, sta, loc, cha, start_epoch + k / fs,
                    len(chunk), fs, reclen,
                )
                struct.pack_into(f">{len(chunk)}i", rec, 64, *chunk)
                f.write(bytes(rec))


# ---------------------------------------------------------------------------
# StationXML + station text
# ---------------------------------------------------------------------------

def station_xml(ids, lats, lons):
    chans = []
    for sid, lat, lon in zip(ids, lats, lons):
        net, sta, loc, cha = sid.split(".")
        poles = "".join(
            f"<Pole number=\"{i}\"><Real>{p.real}</Real>"
            f"<Imaginary>{p.imag}</Imaginary></Pole>"
            for i, p in enumerate(POLES)
        )
        zeros = "".join(
            f"<Zero number=\"{i}\"><Real>{z.real}</Real>"
            f"<Imaginary>{z.imag}</Imaginary></Zero>"
            for i, z in enumerate(ZEROS)
        )
        firs = "".join(
            f"<NumeratorCoefficient>{c}</NumeratorCoefficient>" for c in FIR
        )
        chans.append(f"""
    <Station code="{sta}">
      <Latitude>{lat}</Latitude><Longitude>{lon}</Longitude>
      <Elevation>200.0</Elevation>
      <Channel code="{cha}" locationCode="{loc}">
        <Latitude>{lat}</Latitude><Longitude>{lon}</Longitude>
        <Elevation>200.0</Elevation><Depth>0.0</Depth>
        <SampleRate>{FS}</SampleRate>
        <Response>
          <InstrumentSensitivity>
            <Value>{SENSITIVITY}</Value><Frequency>1.0</Frequency>
            <InputUnits><Name>Pa</Name></InputUnits>
            <OutputUnits><Name>COUNTS</Name></OutputUnits>
          </InstrumentSensitivity>
          <Stage number="1">
            <PolesZeros>
              <InputUnits><Name>Pa</Name></InputUnits>
              <OutputUnits><Name>V</Name></OutputUnits>
              <PzTransferFunctionType>LAPLACE (RADIANS/SECOND)</PzTransferFunctionType>
              <NormalizationFactor>{A0}</NormalizationFactor>
              <NormalizationFrequency>1.0</NormalizationFrequency>
              {zeros}{poles}
            </PolesZeros>
            <StageGain><Value>{SENSOR_GAIN}</Value><Frequency>1.0</Frequency></StageGain>
          </Stage>
          <Stage number="2">
            <StageGain><Value>{DIGITIZER_GAIN * COUNTS_SCALE}</Value><Frequency>1.0</Frequency></StageGain>
          </Stage>
          <Stage number="3">
            <FIR>
              <InputUnits><Name>COUNTS</Name></InputUnits>
              <OutputUnits><Name>COUNTS</Name></OutputUnits>
              {firs}
            </FIR>
            <Decimation>
              <InputSampleRate>{FS}</InputSampleRate><Factor>1</Factor>
              <Offset>0</Offset><Delay>0.05</Delay><Correction>0.05</Correction>
            </Decimation>
            <StageGain><Value>1.0</Value><Frequency>1.0</Frequency></StageGain>
          </Stage>
        </Response>
      </Channel>
    </Station>""")
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<FDSNStationXML xmlns="http://www.fdsn.org/xml/station/1" '
        'schemaVersion="1.1">\n  <Network code="IM">'
        + "".join(chans) + "\n  </Network>\n</FDSNStationXML>\n"
    )


def station_text(ids, lats, lons):
    rows = [
        "#Network|Station|Location|Channel|Latitude|Longitude|Elevation|"
        "Depth|Azimuth|Dip|SensorDescription|Scale|ScaleFreq|ScaleUnits|"
        "SampleRate|StartTime|EndTime"
    ]
    for sid, lat, lon in zip(ids, lats, lons):
        net, sta, loc, cha = sid.split(".")
        rows.append(
            f"{net}|{sta}|{loc}|{cha}|{lat}|{lon}|200.0|0.0|0.0|0.0|"
            f"infrasound|{SENSITIVITY}|1.0|Pa|{FS}|"
            "2018-01-01T00:00:00|2030-01-01T00:00:00"
        )
    return "\n".join(rows) + "\n"


def main():
    st = synthetic_plane_wave(
        nchans=NCHANS, duration_s=DURATION_S, fs=FS, baz_deg=BAZ,
        trace_vel_kms=VEL, f0=0.9, bandwidth=1.6, snr=8.0,
        start_epoch=START_EPOCH, seed=SEED, outlier_channels=(5,),
    )
    # unique station codes (I53H1..I53H8) so each channel has its own sid
    ids = [f"IM.I53H{k + 1}..BDF" for k in range(NCHANS)]
    counts = np.stack([
        np.round(forward_apply(st.data[c], FS)).astype(np.int64)
        for c in range(NCHANS)
    ])
    assert np.abs(counts).max() < 2**31 - 1
    write_mseed_int32(
        os.path.join(HERE, "i53_synth_event.mseed"),
        ids, counts, FS, START_EPOCH,
    )
    with open(os.path.join(HERE, "i53_synth_event.xml"), "w") as f:
        f.write(station_xml(ids, st.latitudes, st.longitudes))
    with open(os.path.join(HERE, "i53_synth_event.txt"), "w") as f:
        f.write(station_text(ids, st.latitudes, st.longitudes))
    meta = {
        "baz_deg": BAZ, "trace_vel_kms": VEL, "fs": FS,
        "duration_s": DURATION_S, "start_epoch": START_EPOCH,
        "nchans": NCHANS, "outlier_channel": 5, "seed": SEED,
        "sensitivity": SENSITIVITY,
    }
    with open(os.path.join(HERE, "i53_synth_event_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print("fixture written:", HERE)


if __name__ == "__main__":
    main()
