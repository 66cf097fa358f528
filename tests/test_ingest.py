"""Native streaming ingest: miniSEED decoding, ring buffer, segment feed.

The miniSEED bytes are constructed independently in the test (pure struct
packing straight from the SEED v2 spec), so the C++ decoder is checked
against the format, not against itself.
"""

import math
import struct

import numpy as np
import pytest

from narrow_band_least_squares_tpu.io.ingest import (
    MSRecord,
    RingBuffer,
    StreamingIngest,
    mseed_to_stream,
    read_mseed_records,
)

native = pytest.importorskip("narrow_band_least_squares_tpu.native")
if native.get_lib(auto_build=True) is None or not hasattr(
    native.get_lib(), "nbls_mseed_scan"
):
    pytest.skip("native ingest runtime unavailable", allow_module_level=True)


# ---------------------------------------------------------------------------
# test-side miniSEED encoder (independent of the C++ code)
# ---------------------------------------------------------------------------

def _header(net, sta, loc, cha, year, doy, hh, mm, ss, fract, nsamp, fs,
            encoding, reclen, big, data_offset=64):
    e = ">" if big else "<"
    h = bytearray(data_offset)
    h[0:6] = b"000001"
    h[6:7] = b"D"
    h[7:8] = b" "
    h[8:13] = sta.ljust(5).encode()
    h[13:15] = loc.ljust(2).encode()
    h[15:18] = cha.ljust(3).encode()
    h[18:20] = net.ljust(2).encode()
    struct.pack_into(e + "HH", h, 20, year, doy)
    h[24], h[25], h[26], h[27] = hh, mm, ss, 0
    struct.pack_into(e + "H", h, 28, fract)
    struct.pack_into(e + "H", h, 30, nsamp)
    struct.pack_into(e + "hh", h, 32, int(fs), 1)   # rate = factor * mult
    h[36] = 0x02  # time correction already applied
    h[39] = 1     # one blockette
    struct.pack_into(e + "i", h, 40, 0)
    struct.pack_into(e + "HH", h, 44, data_offset, 48)
    struct.pack_into(e + "HH", h, 48, 1000, 0)      # blockette 1000
    h[52] = encoding
    h[53] = 1 if big else 0
    h[54] = int(math.log2(reclen))
    return h


def make_int32_record(samples, net="IM", sta="I53H1", loc="", cha="BDF",
                      year=2018, doy=353, hh=1, mm=45, ss=0, fract=0,
                      fs=20, reclen=512, big=True):
    e = ">" if big else "<"
    rec = bytearray(reclen)
    rec[:64] = _header(net, sta, loc, cha, year, doy, hh, mm, ss, fract,
                       len(samples), fs, 3, reclen, big)
    struct.pack_into(e + f"{len(samples)}i", rec, 64, *samples)
    return bytes(rec)


def steim1_frames(samples, nframes):
    """Steim1-encode int samples into nframes 64-byte big-endian frames."""
    diffs = np.diff(np.asarray(samples, np.int64), prepend=samples[0])
    words = []  # (ck, packed4bytes)
    i = 0
    while i < len(diffs):
        rem = len(diffs) - i
        if rem >= 4 and np.all(np.abs(diffs[i:i + 4]) <= 127):
            words.append((1, struct.pack(">4b", *diffs[i:i + 4])))
            i += 4
        elif rem >= 2 and np.all(np.abs(diffs[i:i + 2]) <= 32767):
            words.append((2, struct.pack(">2h", *diffs[i:i + 2])))
            i += 2
        else:
            words.append((3, struct.pack(">i", int(diffs[i]))))
            i += 1
    frames = bytearray(64 * nframes)
    w = 1  # word index within frame (0 = nibbles)
    f = 0
    cks = [[0] * 16 for _ in range(nframes)]
    # frame 0: X0 / Xn integration constants
    struct.pack_into(">i", frames, 4, int(samples[0]))
    struct.pack_into(">i", frames, 8, int(samples[-1]))
    w = 3
    for ck, payload in words:
        if w == 16:
            f += 1
            w = 1
            if f >= nframes:
                raise ValueError("not enough frames")
        frames[f * 64 + 4 * w : f * 64 + 4 * w + 4] = payload
        cks[f][w] = ck
        w += 1
    for fi in range(nframes):
        nib = 0
        for wi in range(16):
            nib |= cks[fi][wi] << (2 * (15 - wi))
        struct.pack_into(">I", frames, fi * 64, nib)
    return bytes(frames)


def make_steim1_record(samples, reclen=512, big=True, **kw):
    rec = bytearray(reclen)
    rec[:64] = _header(kw.pop("net", "IM"), kw.pop("sta", "I53H1"),
                       kw.pop("loc", ""), kw.pop("cha", "BDF"),
                       kw.pop("year", 2018), kw.pop("doy", 353),
                       kw.pop("hh", 1), kw.pop("mm", 45), kw.pop("ss", 0),
                       kw.pop("fract", 0), len(samples), kw.pop("fs", 20),
                       10, reclen, big)
    rec[64:] = steim1_frames(samples, (reclen - 64) // 64)
    return bytes(rec)


def _epoch(year, doy, hh, mm, ss, fract=0):
    import datetime as dt
    d = dt.datetime(year, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        days=doy - 1, hours=hh, minutes=mm, seconds=ss)
    return d.timestamp() + fract * 1e-4


# ---------------------------------------------------------------------------
# miniSEED decoding
# ---------------------------------------------------------------------------

class TestMiniSEED:
    def test_int32_roundtrip_big_endian(self):
        samples = list(range(-50, 50))
        recs = read_mseed_records(make_int32_record(samples))
        assert len(recs) == 1
        r = recs[0]
        assert r.sid == "IM.I53H1..BDF"
        assert r.fs == 20.0
        assert r.t0 == pytest.approx(_epoch(2018, 353, 1, 45, 0), abs=1e-6)
        np.testing.assert_array_equal(r.samples, samples)

    def test_int32_little_endian(self):
        samples = [2 ** 30, -(2 ** 30), 7, -7]
        recs = read_mseed_records(make_int32_record(samples, big=False))
        np.testing.assert_array_equal(recs[0].samples, samples)

    def test_fractional_start_time(self):
        recs = read_mseed_records(make_int32_record([1, 2, 3], fract=1234))
        assert recs[0].t0 == pytest.approx(
            _epoch(2018, 353, 1, 45, 0) + 0.1234, abs=1e-7)

    def test_multiple_records_concatenated(self):
        buf = (make_int32_record([1, 2, 3], cha="BDF", sta="I53H1")
               + make_int32_record([4, 5], cha="BDF", sta="I53H2", mm=46))
        recs = read_mseed_records(buf)
        assert [r.sid for r in recs] == ["IM.I53H1..BDF", "IM.I53H2..BDF"]
        np.testing.assert_array_equal(recs[0].samples, [1, 2, 3])
        np.testing.assert_array_equal(recs[1].samples, [4, 5])

    def test_steim1(self):
        rng = np.random.default_rng(11)
        # mixture of small/medium/large differences
        steps = np.concatenate([
            rng.integers(-100, 100, 40),
            rng.integers(-30000, 30000, 10),
            rng.integers(-2 ** 28, 2 ** 28, 5),
            rng.integers(-5, 5, 45),
        ])
        samples = np.cumsum(steps).astype(np.int64)
        samples -= samples[0] - 1000
        recs = read_mseed_records(make_steim1_record(list(samples)))
        np.testing.assert_array_equal(recs[0].samples, samples)

    def test_steim2_known_answer(self):
        """Hand-built Steim2 frame: every dnib variant, checked against
        spec-side cumulative sums computed in the test."""
        x0 = 1000
        # diff stream (first is ignored; x0 seeds the sequence)
        d_c3n1 = [0, -2, 3, -4, 5, -6]          # six 5-bit (w3)
        d_c2n3 = [400, -500, 120]               # three 10-bit (w4)
        d_c2n2 = [16000, -16000]                # two 15-bit (w5)
        d_c1 = [1, -1, 100, -100]               # four 8-bit (w6)
        d_c3n0 = [31, -31, 5, -5, 0]            # five 6-bit (w7)
        d_c3n2 = [7, -8, 1, -1, 2, -2, 3]       # seven 4-bit (w8)
        d_c2n1 = [2 ** 29 - 1]                  # one 30-bit (w9)
        diffs = (d_c3n1 + d_c2n3 + d_c2n2 + d_c1 + d_c3n0 + d_c3n2 + d_c2n1)
        samples = [x0]
        for d in diffs[1:]:
            samples.append(samples[-1] + d)

        def pack_fields(dnib, vals, bits):
            # fields are right-aligned (last diff ends at bit 0), per spec
            v = dnib << 30
            shift = bits * (len(vals) - 1)
            for x in vals:
                v |= (x & ((1 << bits) - 1)) << shift
                shift -= bits
            return v

        frame = bytearray(64)
        words = [0] * 16
        cks = [0] * 16
        words[1] = x0 & 0xFFFFFFFF
        words[2] = samples[-1] & 0xFFFFFFFF
        words[3], cks[3] = pack_fields(1, d_c3n1, 5), 3
        words[4], cks[4] = pack_fields(3, d_c2n3, 10), 2
        words[5], cks[5] = pack_fields(2, d_c2n2, 15), 2
        words[6], cks[6] = struct.unpack(">I", struct.pack(">4b", *d_c1))[0], 1
        words[7], cks[7] = pack_fields(0, d_c3n0, 6), 3
        words[8], cks[8] = pack_fields(2, d_c3n2, 4), 3
        words[9], cks[9] = pack_fields(1, d_c2n1, 30), 2
        nib = 0
        for wi in range(16):
            nib |= cks[wi] << (2 * (15 - wi))
        words[0] = nib
        for wi, wv in enumerate(words):
            struct.pack_into(">I", frame, 4 * wi, wv)

        reclen = 128
        rec = bytearray(reclen)
        rec[:64] = _header("IM", "I53H1", "", "BDF", 2018, 353, 1, 45, 0, 0,
                           len(samples), 20, 11, reclen, True)
        rec[64:128] = frame
        recs = read_mseed_records(bytes(rec))
        np.testing.assert_array_equal(recs[0].samples, samples)

    def test_malformed_raises(self):
        with pytest.raises(ValueError):
            read_mseed_records(b"\x00" * 256)

    def test_mutation_robustness(self):
        """Network-fed bytes land in the native decoder: every single-byte
        corruption and truncation of a valid record must either decode
        (payload/ignored-field bytes) or raise ValueError — never crash or
        mis-walk the record stream (seeded sweep; a 2000-case fuzz of the
        same form found zero non-ValueError failures)."""
        base = bytearray(make_int32_record(list(range(100))))
        rng = np.random.default_rng(0)
        for _ in range(300):
            buf = bytearray(base)
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
            try:
                read_mseed_records(bytes(buf))
            except ValueError:
                pass
        for cut in range(1, 256, 17):
            try:
                read_mseed_records(bytes(base[:-cut]))
            except ValueError:
                pass

    def test_stream_assembly_with_gap_and_pattern(self):
        coords = {
            "IM.I53H1..BDF": (64.0, -147.0),
            "IM.I53H2..BDF": (64.001, -147.001),
        }
        buf = (
            make_int32_record(list(range(100)), sta="I53H1")
            + make_int32_record(list(range(100)), sta="I53H2")
            # second record for H1 leaves a 100-sample gap (fs=20 -> 5 s)
            + make_int32_record(list(range(100, 200)), sta="I53H1", mm=45,
                                ss=10)
            + make_int32_record(list(range(10)), sta="XXXXX", cha="BHZ")
        )
        recs = read_mseed_records(buf)
        st = mseed_to_stream(recs, coords, channel_pattern="IM.*.BDF",
                             fill_value=0.0)
        assert st.nchans == 2
        assert st.fs == 20.0
        assert st.npts == 300
        np.testing.assert_array_equal(st.data[0, :100], np.arange(100))
        np.testing.assert_array_equal(st.data[0, 100:200], 0.0)  # gap
        np.testing.assert_array_equal(st.data[0, 200:], np.arange(100, 200))
        np.testing.assert_array_equal(st.data[1, :100], np.arange(100))
        np.testing.assert_array_equal(st.data[1, 100:], 0.0)


# ---------------------------------------------------------------------------
# ring buffer
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("native_ring", [True, False])
class TestRingBuffer:
    def _make(self, nchans, cap, native_ring):
        rb = RingBuffer(nchans, cap)
        if not native_ring:
            # force the NumPy fallback for semantic equivalence tests
            rb2 = RingBuffer.__new__(RingBuffer)
            rb2.nchans, rb2.capacity = nchans, cap
            rb2._h = None
            rb2._data = np.zeros((nchans, cap))
            rb2._valid = np.zeros((nchans, cap), dtype=bool)
            rb2._base = 0
            rb2._started = False
            rb2._hi = 0
            return rb2
        assert rb.is_native
        return rb

    def test_append_read_roundtrip(self, native_ring):
        rb = self._make(2, 100, native_ring)
        rb.append(0, 0, np.arange(50.0))
        rb.append(1, 0, np.arange(50.0) * 2)
        out, missing = rb.read(0, 50)
        assert missing == 0
        np.testing.assert_array_equal(out[0], np.arange(50.0))
        np.testing.assert_array_equal(out[1], np.arange(50.0) * 2)

    def test_ready_frontier_tracks_all_channels(self, native_ring):
        rb = self._make(2, 100, native_ring)
        rb.append(0, 0, np.ones(30))
        assert rb.ready(0) == 0           # channel 1 empty
        rb.append(1, 0, np.ones(10))
        assert rb.ready(0) == 10
        rb.append(1, 10, np.ones(20))
        assert rb.ready(0) == 30

    def test_gap_then_fill(self, native_ring):
        rb = self._make(1, 100, native_ring)
        rb.append(0, 0, np.ones(10))
        rb.append(0, 20, np.ones(10))     # gap [10, 20)
        assert rb.ready(0) == 10
        out, missing = rb.read(0, 30, fill=-9.0)
        assert missing == 10
        np.testing.assert_array_equal(out[0, 10:20], -9.0)
        rb.append(0, 10, np.full(10, 5.0))
        assert rb.ready(0) == 30
        out, missing = rb.read(0, 30)
        assert missing == 0

    def test_wraparound_and_window_advance(self, native_ring):
        rb = self._make(1, 50, native_ring)
        rb.append(0, 0, np.arange(50.0))
        rb.append(0, 50, np.arange(50.0, 80.0))   # advances base to 30
        assert rb.base == 30
        out, missing = rb.read(30, 50)
        assert missing == 0
        np.testing.assert_array_equal(out[0], np.arange(30.0, 80.0))
        # data below the window is gone
        out, missing = rb.read(0, 30)
        assert missing == 30

    def test_release(self, native_ring):
        rb = self._make(1, 100, native_ring)
        rb.append(0, 0, np.ones(60))
        rb.release(40)
        assert rb.base == 40
        out, missing = rb.read(0, 40)
        assert missing == 40
        out, missing = rb.read(40, 20)
        assert missing == 0

    def test_overwrite_last_write_wins(self, native_ring):
        rb = self._make(1, 100, native_ring)
        rb.append(0, 0, np.ones(20))
        rb.append(0, 10, np.full(20, 3.0))
        out, _ = rb.read(0, 30)
        np.testing.assert_array_equal(out[0, :10], 1.0)
        np.testing.assert_array_equal(out[0, 10:30], 3.0)


# ---------------------------------------------------------------------------
# streaming ingest -> monitor segments
# ---------------------------------------------------------------------------

class TestStreamingIngest:
    def _ingest(self, halo=0):
        ids = ["IM.I53H1..BDF", "IM.I53H2..BDF"]
        return StreamingIngest(
            ids, fs=20.0, segment_npts=200,
            latitudes=[64.0, 64.001], longitudes=[-147.0, -147.001],
            halo_npts=halo,
        )

    def test_shuffled_blocks_assemble(self):
        """Fully out-of-order arrival: segments tile from the earliest
        sample once the buffer is drained."""
        ing = self._ingest()
        t0 = _epoch(2018, 353, 1, 45, 0)
        rng = np.random.default_rng(0)
        x = {sid: rng.standard_normal(500) for sid in ing.ids}
        blocks = [(sid, k) for sid in ing.ids for k in range(5)]
        rng.shuffle(blocks)
        for sid, k in blocks:
            ing.feed_records([MSRecord(sid, t0 + k * 100 / 20.0, 20.0,
                                       x[sid][k * 100:(k + 1) * 100])])
        segs = list(ing.ready_segments())
        assert len(segs) == 2      # 500 samples -> two whole 200-segments
        for s, seg in enumerate(segs):
            assert seg.start_epoch == pytest.approx(t0 + s * 10.0)
            for c, sid in enumerate(ing.ids):
                np.testing.assert_array_equal(
                    seg.data[c], x[sid][s * 200:(s + 1) * 200])

    def test_interleaved_feed_and_emit(self):
        """In-order feeding with channel jitter: segments stream out as the
        all-channel frontier advances."""
        ing = self._ingest()
        t0 = _epoch(2018, 353, 1, 45, 0)
        rng = np.random.default_rng(1)
        x = {sid: rng.standard_normal(600) for sid in ing.ids}
        segs = []
        for k in range(6):   # channel B lags one block behind channel A
            ing.feed_records([MSRecord(ing.ids[0], t0 + k * 5.0, 20.0,
                                       x[ing.ids[0]][k * 100:(k + 1) * 100])])
            if k > 0:
                kb = k - 1
                ing.feed_records([MSRecord(ing.ids[1], t0 + kb * 5.0, 20.0,
                                           x[ing.ids[1]][kb * 100:(kb + 1) * 100])])
            segs.extend(ing.ready_segments())
        ing.feed_records([MSRecord(ing.ids[1], t0 + 25.0, 20.0,
                                   x[ing.ids[1]][500:600])])
        segs.extend(ing.ready_segments())
        assert len(segs) == 3
        for s, seg in enumerate(segs):
            assert seg.start_epoch == pytest.approx(t0 + s * 10.0)
            for c, sid in enumerate(ing.ids):
                np.testing.assert_array_equal(
                    seg.data[c], x[sid][s * 200:(s + 1) * 200])

    def test_halo_delays_emission(self):
        ing = self._ingest(halo=50)
        t0 = 1545183900.0
        for sid in ing.ids:
            ing.feed_block(sid, t0, np.ones(200))
        assert list(ing.ready_segments()) == []   # needs 50 halo samples more
        for sid in ing.ids:
            ing.feed_block(sid, t0 + 10.0, np.ones(50))
        assert len(list(ing.ready_segments())) == 1

    def test_foreign_records_dropped(self):
        ing = self._ingest()
        ing.feed_records([MSRecord("XX.FOO..BHZ", 0.0, 20.0, np.ones(10))])
        assert ing.dropped_records == 1

    def test_feeds_streaming_monitor(self, tmp_path):
        """End-to-end: miniSEED bytes -> ingest -> StreamingMonitor."""
        import jax
        from narrow_band_least_squares_tpu.models.streaming import (
            StreamingMonitor,
        )
        from narrow_band_least_squares_tpu.utils.geometry import get_rij
        from narrow_band_least_squares_tpu.utils.plan import (
            get_freqlist, get_winlenlist, make_plan,
        )
        from narrow_band_least_squares_tpu.io.synthetic import (
            synthetic_plane_wave,
        )

        st = synthetic_plane_wave(nchans=4, duration_s=240.0, fs=10.0,
                                  baz_deg=120.0, trace_vel_kms=0.33,
                                  f0=0.7, bandwidth=0.8, snr=10.0, seed=5)
        seg_npts = 600   # 60 s segments
        freqlist, nbands, _ = get_freqlist(0.3, 1.5, "log", 2)
        winlens = get_winlenlist("constant", nbands, 15, 0, 0)
        plan = make_plan(freqlist, "log", winlens, 0.5, seg_npts, st.fs)

        ing = StreamingIngest(
            st.ids, fs=st.fs, segment_npts=seg_npts,
            latitudes=st.latitudes, longitudes=st.longitudes,
        )
        mon = StreamingMonitor(
            plan, get_rij(st.latitudes, st.longitudes, st.nchans),
            str(tmp_path), freqlist, alpha=1.0,
        )
        # encode the synthetic stream as int32 miniSEED records and feed
        scale = 1e4
        nrec_samps = 100
        recs = []
        for c, sid in enumerate(st.ids):
            for k in range(0, st.npts, nrec_samps):
                block = (st.data[c, k:k + nrec_samps] * scale).astype(int)
                recs.append(MSRecord(sid, st.start_epoch + k / st.fs,
                                     st.fs, np.asarray(block, float)))
        ing.feed_records(recs)
        done = []
        for seg in ing.ready_segments():
            done.extend(mon.process(seg, resume=False))
        assert len(done) == 4      # 240 s / 60 s
        vel, baz, mdccm, t, num = mon.read_all()
        good = mdccm > 0.6
        assert good.any()
        med_baz = np.median(baz[good])
        assert abs(med_baz - 120.0) < 10.0


class TestNativeEncoder:
    """Steim1 write side (nbls_mseed_encode): exact round trips through the
    native decoder, including every diff width and record boundaries."""

    def test_adversarial_round_trip(self):
        from narrow_band_least_squares_tpu.io.ingest import (
            encode_mseed, read_mseed_records,
        )
        rng = np.random.default_rng(0)
        x = np.concatenate([
            rng.integers(-2**30, 2**30, size=50).astype(float),   # 32-bit diffs
            np.cumsum(rng.integers(-100, 100, size=500)).astype(float),  # 8-bit
            np.zeros(37),
            np.cumsum(rng.integers(-30000, 30000, size=300)).astype(float),  # 16-bit
        ])
        buf = encode_mseed("IM.I53H1..BDF", x, 20.0, 1545183900.25)
        recs = read_mseed_records(buf)
        y = np.concatenate([r.samples for r in recs])
        np.testing.assert_array_equal(y, x)
        assert abs(recs[0].t0 - 1545183900.25) < 1e-4
        assert recs[0].fs == 20.0
        assert recs[0].sid == "IM.I53H1..BDF"
        # record timestamps chain correctly
        n = 0
        for r in recs:
            assert abs(r.t0 - (1545183900.25 + n / 20.0)) < 1e-4
            n += len(r.samples)

    def test_stream_write_read(self, tmp_path):
        from narrow_band_least_squares_tpu.io.ingest import (
            mseed_to_stream, read_mseed, write_mseed,
        )
        from narrow_band_least_squares_tpu.io.stream import ArrayStream
        rng = np.random.default_rng(1)
        st = ArrayStream(
            data=np.round(rng.normal(scale=1000, size=(3, 1000))),
            fs=20.0, start_epoch=1545183900.0,
            latitudes=[64.1, 64.2, 64.3],
            longitudes=[-147.1, -147.2, -147.3],
            ids=["IM.A..BDF", "IM.B..BDF", "IM.C..BDF"],
        )
        p = str(tmp_path / "rt.mseed")
        write_mseed(p, st)
        st2 = mseed_to_stream(
            read_mseed(p),
            {s: (la, lo) for s, la, lo in
             zip(st.ids, st.latitudes, st.longitudes)},
        )
        np.testing.assert_array_equal(st2.data, st.data)
        assert st2.fs == st.fs
        assert abs(st2.start_epoch - st.start_epoch) < 1e-4

    def test_overflow_rejected(self):
        from narrow_band_least_squares_tpu.io.ingest import encode_mseed
        with pytest.raises(ValueError):
            encode_mseed("IM.A..BDF", np.array([3e9]), 20.0, 0.0)
