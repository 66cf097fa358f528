from narrow_band_least_squares_tpu.ops import filters, windows, xcorr, solve, lts

__all__ = ["filters", "windows", "xcorr", "solve", "lts"]
