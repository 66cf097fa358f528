"""Full instrument-response deconvolution (io.response).

Verified three independent ways (VERDICT r1 item 5; ObsPy is not installed
in this environment, so scipy + analytic forward modeling stand in for it):

1. analog poles/zeros evaluation vs scipy.signal.freqs_zpk
2. FIR stage evaluation vs scipy.signal.freqz
3. round-trip: physical signal -> forward-applied response (independent
   scipy evaluation) -> remove_response -> recovered signal
"""

import numpy as np
import pytest
from scipy import signal

from narrow_band_least_squares_tpu.io.response import (
    CoefficientsStage,
    InstrumentResponse,
    PolesZerosStage,
    evaluate_response,
    parse_stationxml,
    remove_response,
)

# A realistic infrasound channel: one analog PZ stage (high-pass sensor),
# a digitizer gain stage, and a short FIR decimation stage.
POLES = [complex(-0.1486, 0.1486), complex(-0.1486, -0.1486)]
ZEROS = [0j, 0j]
SENSOR_GAIN = 0.02       # V/Pa
DIGITIZER_GAIN = 400000.0  # counts/V
FIR = [0.25, 0.5, 0.25]


def _a0(poles, zeros, f_norm):
    s = 2j * np.pi * f_norm
    num = np.prod([s - z for z in zeros])
    den = np.prod([s - p for p in poles])
    return float(1.0 / abs(num / den))


A0 = _a0(POLES, ZEROS, 1.0)
SENSITIVITY = SENSOR_GAIN * DIGITIZER_GAIN  # at 1 Hz where |H_pz| = 1


def _xml(sensitivity=SENSITIVITY, include_fir=True):
    fir_xml = """
      <Stage number="3">
        <FIR>
          <InputUnits><Name>COUNTS</Name></InputUnits>
          <OutputUnits><Name>COUNTS</Name></OutputUnits>
          <NumeratorCoefficient>0.25</NumeratorCoefficient>
          <NumeratorCoefficient>0.5</NumeratorCoefficient>
          <NumeratorCoefficient>0.25</NumeratorCoefficient>
        </FIR>
        <Decimation>
          <InputSampleRate>20.0</InputSampleRate>
          <Factor>1</Factor>
          <Offset>0</Offset>
          <Delay>0.05</Delay>
          <Correction>0.05</Correction>
        </Decimation>
        <StageGain><Value>1.0</Value><Frequency>1.0</Frequency></StageGain>
      </Stage>""" if include_fir else ""
    pz_items = "".join(
        f"<Pole number=\"{i}\"><Real>{p.real}</Real>"
        f"<Imaginary>{p.imag}</Imaginary></Pole>"
        for i, p in enumerate(POLES)
    ) + "".join(
        f"<Zero number=\"{i}\"><Real>{z.real}</Real>"
        f"<Imaginary>{z.imag}</Imaginary></Zero>"
        for i, z in enumerate(ZEROS)
    )
    return f"""<?xml version="1.0" encoding="UTF-8"?>
<FDSNStationXML xmlns="http://www.fdsn.org/xml/station/1" schemaVersion="1.1">
  <Network code="IM">
    <Station code="I53H1">
      <Latitude>64.87</Latitude><Longitude>-147.86</Longitude>
      <Channel code="BDF" locationCode="">
        <Latitude>64.87</Latitude><Longitude>-147.86</Longitude>
        <SampleRate>20.0</SampleRate>
        <Response>
          <InstrumentSensitivity>
            <Value>{sensitivity}</Value>
            <Frequency>1.0</Frequency>
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
              {pz_items}
            </PolesZeros>
            <StageGain><Value>{SENSOR_GAIN}</Value><Frequency>1.0</Frequency></StageGain>
          </Stage>
          <Stage number="2">
            <StageGain><Value>{DIGITIZER_GAIN}</Value><Frequency>1.0</Frequency></StageGain>
          </Stage>{fir_xml}
        </Response>
      </Channel>
    </Station>
  </Network>
</FDSNStationXML>"""


@pytest.fixture(scope="module")
def resp():
    responses = parse_stationxml(_xml())
    return responses["IM.I53H1..BDF"]


class TestParsing:
    def test_channel_key_and_sensitivity(self, resp):
        assert resp.sensitivity == pytest.approx(SENSITIVITY)
        assert resp.input_units == "Pa"
        assert len(resp.stages) == 3

    def test_pz_stage(self, resp):
        pz = resp.stages[0]
        assert isinstance(pz, PolesZerosStage)
        np.testing.assert_allclose(sorted(pz.poles.imag), sorted([p.imag for p in POLES]))
        assert pz.normalization == pytest.approx(A0)
        assert pz.gain == pytest.approx(SENSOR_GAIN)

    def test_fir_stage(self, resp):
        fir = resp.stages[2]
        assert isinstance(fir, CoefficientsStage)
        np.testing.assert_allclose(fir.numerator, FIR)
        assert fir.input_sample_rate == 20.0
        assert fir.delay_correction == pytest.approx(0.05)


class TestEvaluation:
    def test_pz_matches_scipy_freqs_zpk(self, resp):
        """Analog stage vs the independent scipy implementation."""
        freqs = np.linspace(0.05, 9.0, 200)
        pz = resp.stages[0]
        _, h_scipy = signal.freqs_zpk(
            ZEROS, POLES, A0 * SENSOR_GAIN, worN=2 * np.pi * freqs
        )
        only_pz = InstrumentResponse(
            sensitivity=0.0, sensitivity_freq=1.0, stages=[pz]
        )
        h_mine = evaluate_response(only_pz, freqs, use_overall_sensitivity=False)
        np.testing.assert_allclose(h_mine, h_scipy, rtol=1e-10)

    def test_fir_matches_scipy_freqz(self, resp):
        freqs = np.linspace(0.0, 9.9, 100)
        fir = resp.stages[2]
        _, h_scipy = signal.freqz(FIR, worN=freqs, fs=20.0)
        h_scipy = h_scipy * np.exp(2j * np.pi * freqs * 0.05)
        only = InstrumentResponse(
            sensitivity=0.0, sensitivity_freq=1.0, stages=[fir]
        )
        h_mine = evaluate_response(only, freqs, use_overall_sensitivity=False)
        np.testing.assert_allclose(h_mine, h_scipy, rtol=1e-10, atol=1e-12)

    def test_overall_magnitude_at_reference_freq(self, resp):
        """|H(1 Hz)| must equal the overall sensitivity (A0 normalization)."""
        h = evaluate_response(resp, np.array([1.0]))
        # FIR is not exactly unity at 1 Hz; compare against its true value
        _, h_fir = signal.freqz(FIR, worN=[1.0], fs=20.0)
        expected = SENSITIVITY * abs(h_fir[0])
        assert abs(h[0]) == pytest.approx(expected, rel=1e-9)


class TestDeconvolution:
    def _forward_apply(self, x, fs):
        """Independent forward model: physical -> counts via scipy-evaluated
        transfer function in the frequency domain."""
        n = x.size
        nfft = 1 << int(np.ceil(np.log2(2 * n)))
        freqs = np.fft.rfftfreq(nfft, d=1.0 / fs)
        _, h_pz = signal.freqs_zpk(
            ZEROS, POLES, A0, worN=2 * np.pi * freqs
        )
        _, h_fir = signal.freqz(FIR, worN=freqs, fs=20.0)
        h_fir = h_fir * np.exp(2j * np.pi * freqs * 0.05)
        h = h_pz * h_fir * SENSITIVITY
        return np.fft.irfft(np.fft.rfft(x, n=nfft) * h, n=nfft)[:n]

    def test_round_trip_recovers_physical_signal(self, resp):
        fs = 20.0
        t = np.arange(int(120 * fs)) / fs
        rng = np.random.default_rng(7)
        # band-limited physical signal well inside the passband
        x = np.zeros_like(t)
        for f0, a in [(0.5, 1.0), (1.3, 0.6), (3.0, 0.3)]:
            x += a * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi))
        taper = signal.windows.tukey(t.size, 0.1)
        x *= taper

        counts = self._forward_apply(x, fs)
        recovered = remove_response(counts, fs, resp, water_level_db=60.0)

        # compare away from the taper edges
        sl = slice(int(10 * fs), int(110 * fs))
        err = np.abs(recovered[sl] - x[sl])
        assert err.max() < 5e-3 * np.abs(x[sl]).max()

    def test_sensitivity_only_differs_where_response_shapes(self, resp):
        """Full deconvolution must correct the low-frequency HP rolloff that
        plain sensitivity division cannot."""
        fs = 20.0
        t = np.arange(int(1000 * fs)) / fs
        f0 = 0.02  # below the HP corner: |H_pz(0.02)| ~ 0.34
        x = np.sin(2 * np.pi * f0 * t) * signal.windows.tukey(t.size, 0.05)
        counts = self._forward_apply(x, fs)
        full = remove_response(
            counts, fs, resp, water_level_db=60.0,
            pre_filt=(0.005, 0.01, 8.0, 9.9),
        )
        sens_only = counts / SENSITIVITY
        sl = slice(int(150 * fs), int(850 * fs))
        amp_full = np.abs(full[sl]).max()
        amp_sens = np.abs(sens_only[sl]).max()
        assert abs(amp_full - 1.0) < 0.1            # corrected
        assert amp_sens < 0.5                        # rolled off, uncorrected

    def test_water_level_bounds_inversion(self, resp):
        """With zeros at DC the inverse blows up at low f; the water level
        must keep the output finite and bounded."""
        fs = 20.0
        rng = np.random.default_rng(3)
        counts = rng.normal(size=int(60 * fs))
        out = remove_response(counts, fs, resp, water_level_db=60.0)
        assert np.isfinite(out).all()
        assert np.abs(out).max() < 1e9


class TestFdsnIntegration:
    def test_gather_waveforms_full_deconvolution(self):
        """The ObsPy-free gather path applies full deconvolution when the
        level=response document is served."""
        from narrow_band_least_squares_tpu.io import fdsn as F

        fs = 20.0
        t = np.arange(int(60 * fs)) / fs
        x = np.sin(2 * np.pi * 1.0 * t) * signal.windows.tukey(t.size, 0.1)
        # forward-apply with the scipy model (the module's own evaluator
        # would be circular)
        counts = TestDeconvolution()._forward_apply(x, fs)

        try:
            from tests.test_ingest import make_int32_record
        except Exception:
            pytest.skip("miniSEED record builder unavailable")

        station_text = (
            "#Network|Station|Location|Channel|Latitude|Longitude|Elevation|"
            "Depth|Azimuth|Dip|SensorDescription|Scale|ScaleFreq|ScaleUnits|"
            "SampleRate|StartTime|EndTime\n"
            f"IM|I53H1||BDF|64.87|-147.86|200.0|0.0|0.0|0.0|sensor|"
            f"{SENSITIVITY}|1.0|Pa|20.0|2018-01-01T00:00:00|2030-01-01T00:00:00\n"
        )

        def fake_fetch(url, timeout=60.0):
            if "dataselect" in url:
                # int32 counts records (scaled to keep quantization small);
                # 100 samples per record = 5 s at 20 Hz
                scaled = np.round(counts * 1e3).astype(np.int64)
                recs = b""
                for k in range(0, scaled.size, 100):
                    sec = 45 * 60 + k // 20
                    recs += make_int32_record(
                        scaled[k:k + 100].tolist(),
                        hh=1 + sec // 3600, mm=(sec // 60) % 60, ss=sec % 60,
                    )
                return recs
            if "level=response" in url:
                # response scaled by the same 1e3 used to make counts
                return _xml(sensitivity=SENSITIVITY * 1e3).encode()
            return station_text.encode()

        st = F.gather_waveforms_fdsn(
            "IRIS", "IM", "I53H1", "", "BDF",
            "2018-12-19T01:45:00", "2018-12-19T01:46:00",
            remove_response=True, _fetch=fake_fetch,
        )
        sl = slice(int(10 * fs), int(50 * fs))
        err = np.abs(st.data[0][sl] - x[sl])
        assert err.max() < 2e-2 * np.abs(x[sl]).max()
