"""Streaming-ingest example: miniSEED records -> ring buffer -> monitor.

Simulates a live station feed: a long synthetic event is encoded as
miniSEED records (int32, one record per channel-chunk, delivered with
per-channel jitter like a real telemetry link), pushed through the native
C++ decoder + ring buffer (`io/ingest.py`), and every completed segment is
processed and persisted by `StreamingMonitor` (checkpoint/resume TSV+npz).

The reference has no streaming path at all — its long-duration workflow is
manual chunked reruns (reference helpers.py:161-235, SURVEY §3.5).

Run:  python examples/example_streaming_ingest.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from narrow_band_least_squares_tpu.io import synthetic_plane_wave
from narrow_band_least_squares_tpu.io.ingest import MSRecord, StreamingIngest
from narrow_band_least_squares_tpu.models.streaming import StreamingMonitor
from narrow_band_least_squares_tpu.utils.geometry import get_rij
from narrow_band_least_squares_tpu.utils.plan import (
    get_freqlist,
    get_winlenlist,
    make_plan,
)

FMIN, FMAX, NBANDS = 0.1, 5.0, 8
SEGMENT_S = 600.0
RECORD_SAMPLES = 400          # samples per simulated record
HERE = os.path.dirname(os.path.abspath(__file__))
SAVE_DIR = os.path.join(HERE, "streaming_out")


def main():
    # 1) one hour of synthetic plane-wave data = the "station"
    st = synthetic_plane_wave(
        nchans=8, duration_s=3600.0, fs=20.0, baz_deg=230.0,
        trace_vel_kms=0.34, f0=0.8, bandwidth=1.2, snr=8.0, seed=7,
    )
    seg_npts = int(SEGMENT_S * st.fs)

    # 2) the monitoring pipeline (per-segment plan) and the ingest front-end
    freqlist, nbands, _ = get_freqlist(FMIN, FMAX, "log", NBANDS)
    winlens = get_winlenlist("adaptive", nbands, 50, 60, 30)
    plan = make_plan(freqlist, "log", winlens, 0.5, seg_npts, st.fs)
    rij = get_rij(st.latitudes, st.longitudes, st.nchans)
    monitor = StreamingMonitor(plan, rij, SAVE_DIR, freqlist, alpha=1.0)
    ingest = StreamingIngest(
        st.ids, fs=st.fs, segment_npts=seg_npts,
        latitudes=st.latitudes, longitudes=st.longitudes,
    )

    # 3) simulate telemetry: per-channel record streams with jitter
    rng = np.random.default_rng(0)
    feed = []
    for c, sid in enumerate(st.ids):
        lag = rng.integers(0, 3)                   # channel arrives late
        for k in range(0, st.npts, RECORD_SAMPLES):
            feed.append((k + lag * RECORD_SAMPLES, MSRecord(
                sid, st.start_epoch + k / st.fs, st.fs,
                st.data[c, k : k + RECORD_SAMPLES],
            )))
    feed.sort(key=lambda kv: kv[0])                # arrival order

    done = 0
    for _, rec in feed:
        ingest.feed_records([rec])
        for segment in ingest.ready_segments():
            recs = monitor.process(segment, resume=True)
            done += len(recs)
            print(f"segment @ {segment.start_epoch:.0f}s processed "
                  f"({len(recs)} new, ring native={ingest.ring.is_native})")
    print(f"{done} segments persisted under {SAVE_DIR}")

    vel, baz, mdccm, t, num = monitor.read_all()
    good = mdccm > 0.6
    print(f"median back-azimuth over {int(good.sum())} confident windows: "
          f"{np.median(baz[good]):.1f} deg (true 230.0)")


if __name__ == "__main__":
    main()
