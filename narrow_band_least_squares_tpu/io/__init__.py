from narrow_band_least_squares_tpu.io.stream import ArrayStream, gather_waveforms
from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave
from narrow_band_least_squares_tpu.io.textio import write_txtfile, read_txtfile

__all__ = [
    "ArrayStream",
    "gather_waveforms",
    "synthetic_plane_wave",
    "write_txtfile",
    "read_txtfile",
]
from narrow_band_least_squares_tpu.io.ingest import (  # noqa: F401
    MSRecord,
    RingBuffer,
    StreamingIngest,
    mseed_to_stream,
    read_mseed,
    read_mseed_records,
)
