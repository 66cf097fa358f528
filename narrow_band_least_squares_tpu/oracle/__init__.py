from narrow_band_least_squares_tpu.oracle.ltsva import (
    design_sos,
    filter_and_taper,
    ltsva_oracle,
    sliding_window_solve,
)
from narrow_band_least_squares_tpu.oracle.pipeline import (
    narrow_band_least_squares_oracle,
)

__all__ = [
    "design_sos",
    "filter_and_taper",
    "ltsva_oracle",
    "sliding_window_solve",
    "narrow_band_least_squares_oracle",
]
