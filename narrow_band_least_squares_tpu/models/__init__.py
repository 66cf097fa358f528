from narrow_band_least_squares_tpu.models.narrowband import (
    NarrowBandPipeline,
    NarrowBandResult,
    flags_to_stdict,
)
from narrow_band_least_squares_tpu.models.broadband import BroadbandPipeline

__all__ = [
    "NarrowBandPipeline",
    "NarrowBandResult",
    "flags_to_stdict",
    "BroadbandPipeline",
]
