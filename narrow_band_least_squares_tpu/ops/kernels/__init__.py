from narrow_band_least_squares_tpu.ops.kernels.xcorr_peak import icorr_peak

__all__ = ["icorr_peak"]
