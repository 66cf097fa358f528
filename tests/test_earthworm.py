"""Earthworm/Winston wave-server client vs a loopback WaveServerV fake.

The reference's L0 contract (`waveform_collection.gather_waveforms`) also
speaks wave servers; this validates the stdlib client end to end: MENU,
GETSCNLRAW framing, TraceBuf2 parsing (both endiannesses and widths),
gap zero-fill assembly, and the `gather_waveforms('ew://...')` dispatch.
"""

import socket
import struct
import threading

import numpy as np
import pytest

from narrow_band_least_squares_tpu.io.earthworm import (
    EarthwormClient,
    gather_waveforms_earthworm,
    parse_tracebuf2,
)

T0 = 1_600_000_000.0
FS = 20.0


def make_tracebuf2(sta, net, chan, loc, start, rate, data, dtype=b"i4"):
    """Build one TraceBuf2 packet (header byte order follows dtype)."""
    order = {"i": "<", "f": "<", "s": ">", "t": ">"}[chr(dtype[0])]
    np_dt = {
        b"i2": "<i2", b"i4": "<i4", b"s2": ">i2", b"s4": ">i4",
        b"f4": "<f4", b"t4": ">f4",
    }[dtype]
    samples = np.asarray(data).astype(np_dt)
    n = len(samples)
    end = start + (n - 1) / rate
    head = struct.pack(order + "ii", 0, n)
    head += struct.pack(order + "ddd", start, end, rate)
    head += sta.encode().ljust(7, b"\x00")
    head += net.encode().ljust(9, b"\x00")
    head += chan.encode().ljust(4, b"\x00")
    head += (loc or "--").encode().ljust(3, b"\x00")
    head += b"20"                       # version
    head += dtype.ljust(3, b"\x00")
    head += b"\x00\x00\x00\x00"         # quality + pad
    assert len(head) == 64
    return head + samples.tobytes()


class FakeWaveServer:
    """Loopback WaveServerV speaking MENU + GETSCNLRAW."""

    def __init__(self, channels):
        # channels: {(sta, chan, net, loc): (start_epoch, rate, samples, dtype)}
        self.channels = channels
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(8)
        self.port = self.sock.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        while True:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            with conn:
                req = b""
                while not req.endswith(b"\n"):
                    c = conn.recv(1)
                    if not c:
                        break
                    req += c
                self._answer(conn, req.decode().strip())

    def _answer(self, conn, req):
        toks = req.split()
        if toks[0] == "MENU:":
            parts = [toks[1]]
            for (sta, chan, net, loc), (t0, rate, x, dt) in self.channels.items():
                t1 = t0 + (len(x) - 1) / rate
                parts += [" 0", sta, chan, net, loc or "--",
                          f"{t0:.4f}", f"{t1:.4f}", dt.decode()]
            conn.sendall((" ".join(parts) + "\n").encode())
            return
        if toks[0] == "GETSCNLRAW:":
            _, rid, sta, chan, net, loc, a, b = toks
            key = (sta, chan, net, loc)
            if key not in self.channels:
                conn.sendall(f"{rid} 0 {sta} {chan} {net} {loc} FN i4\n".encode())
                return
            t0c, rate, x, dt = self.channels[key]
            a, b = float(a), float(b)
            i0 = max(0, int(np.ceil((a - t0c) * rate)))
            i1 = min(len(x), int(np.floor((b - t0c) * rate)) + 1)
            if i1 <= i0:
                conn.sendall(f"{rid} 0 {sta} {chan} {net} {loc} FG i4\n".encode())
                return
            # two packets with a one-sample gap between them (tests fill)
            mid = (i0 + i1) // 2
            pk1 = make_tracebuf2(sta, net, chan, loc, t0c + i0 / rate,
                                 rate, x[i0:mid], dt)
            pk2 = make_tracebuf2(sta, net, chan, loc, t0c + (mid + 1) / rate,
                                 rate, x[mid + 1:i1], dt)
            payload = pk1 + pk2
            head = (f"{rid} 0 {sta} {chan} {net} {loc} F {dt.decode()} "
                    f"{t0c + i0 / rate:.4f} {len(payload)}\n")
            conn.sendall(head.encode() + payload)

    def close(self):
        self.sock.close()


@pytest.fixture(scope="module")
def server():
    rng = np.random.default_rng(5)
    n = int(120 * FS)
    channels = {}
    for i, dt in enumerate((b"i4", b"s4", b"i2", b"t4")):
        x = (rng.standard_normal(n) * 50).astype(np.int32)
        channels[(f"ST{i}", "BDF", "XX", "--")] = (T0, FS, x, dt)
    srv = FakeWaveServer(channels)
    yield srv, channels
    srv.close()


def test_tracebuf2_roundtrip():
    x = np.arange(-5, 40, dtype=np.int32)
    for dt in (b"i4", b"s4", b"i2", b"s2", b"f4", b"t4"):
        pkt = make_tracebuf2("STA", "NT", "CHZ", "01", T0, FS, x, dt)
        blocks = parse_tracebuf2(pkt + pkt)      # concatenation framing
        assert len(blocks) == 2
        b = blocks[0]
        assert (b["sta"], b["net"], b["chan"], b["loc"]) == (
            "STA", "NT", "CHZ", "01")
        assert b["rate"] == FS and b["start"] == T0
        np.testing.assert_array_equal(b["data"], x.astype(np.float64))


def test_menu(server):
    srv, channels = server
    cl = EarthwormClient("127.0.0.1", srv.port)
    menu = cl.menu()
    assert {m["sta"] for m in menu} == {f"ST{i}" for i in range(4)}
    assert all(m["net"] == "XX" and m["chan"] == "BDF" for m in menu)


def test_get_scnl_raw_and_gap_fill(server):
    srv, channels = server
    cl = EarthwormClient("127.0.0.1", srv.port)
    t0, t1 = T0 + 10.0, T0 + 50.0
    blocks = cl.get_scnl_raw("ST0", "BDF", "XX", "--", t0, t1)
    assert len(blocks) == 2              # the fake splits with a 1-sample gap
    st = gather_waveforms_earthworm(
        "127.0.0.1", srv.port, "XX", ["ST0", "ST1"], "--", "BDF", t0, t1,
        coordinates={"ST0": (64.0, -148.0), "ST1": (64.001, -148.001)},
    )
    assert st.nchans == 2
    assert st.fs == FS
    assert st.npts == int((t1 - t0) * FS)
    truth = channels[("ST0", "BDF", "XX", "--")][2]
    i0 = int((t0 - T0) * FS)
    expect = truth[i0 : i0 + st.npts].astype(np.float64)
    mid_gap = np.flatnonzero(st.data[0] != expect)
    assert len(mid_gap) == 1             # exactly the zero-filled gap sample
    assert st.data[0][mid_gap[0]] == 0.0
    assert st.latitudes == [64.0, 64.001]


def test_missing_channel_raises(server):
    srv, _ = server
    with pytest.raises(RuntimeError, match="no data"):
        gather_waveforms_earthworm(
            "127.0.0.1", srv.port, "XX", ["NOPE"], "--", "BDF",
            T0 + 10, T0 + 20, coordinates={"NOPE": (0.0, 0.0)},
        )


def test_gather_waveforms_dispatch(server, tmp_path):
    srv, _ = server
    from narrow_band_least_squares_tpu.io.stream import gather_waveforms

    st = gather_waveforms(
        f"ew://127.0.0.1:{srv.port}", "XX", "ST0,ST1,ST2", "--", "BDF",
        T0 + 10.0, T0 + 50.0, remove_response=False,
        cache=str(tmp_path / "ew.npz"),
        coordinates={f"ST{i}": (64.0 + i * 1e-3, -148.0) for i in range(3)},
    )
    assert st.nchans == 3
    # cache round-trip
    st2 = gather_waveforms(
        f"ew://127.0.0.1:{srv.port}", "XX", "ST0,ST1,ST2", "--", "BDF",
        T0 + 10.0, T0 + 50.0, remove_response=False,
        cache=str(tmp_path / "ew.npz"),
    )
    np.testing.assert_array_equal(st.data, st2.data)


def test_truncated_payload_rejected():
    """A short binary payload must raise, not zero-fill silently."""
    import threading

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def answer():
        conn, _ = srv.accept()
        with conn:
            req = b""
            while not req.endswith(b"\n"):
                c = conn.recv(1)
                if not c:
                    return
                req += c
            pkt = make_tracebuf2("STA", "XX", "BDF", "--", T0, FS,
                                 np.arange(100, dtype=np.int32))
            # advertise more bytes than we send, then close
            head = f"0 0 STA BDF XX -- F i4 {T0:.4f} {len(pkt) * 2}\n"
            conn.sendall(head.encode() + pkt)

    t = threading.Thread(target=answer, daemon=True)
    t.start()
    cl = EarthwormClient("127.0.0.1", port, timeout=5.0)
    with pytest.raises(RuntimeError, match="truncated"):
        cl.get_scnl_raw("STA", "BDF", "XX", "--", T0, T0 + 5)
    srv.close()


def test_wave_server_url_validation():
    from narrow_band_least_squares_tpu.io.stream import gather_waveforms

    with pytest.raises(ValueError, match="host:port"):
        gather_waveforms("ew://hostonly", "XX", "ST0", "--", "BDF",
                         T0, T0 + 10, remove_response=False)
    with pytest.raises(ValueError, match="wildcard"):
        gather_waveforms("ew://h:123", "XX", "ST*", "--", "BDF",
                         T0, T0 + 10, remove_response=False)
