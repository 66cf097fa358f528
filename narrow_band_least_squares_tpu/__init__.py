"""TPU-native narrow-band least-squares infrasound array processing.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``amiezzi/narrow_band_least_squares`` (reference layout: ``helpers.py``,
``narrow_band_least_squares.py``, ``plotting.py``, plus the vendored
``lts_array``/``waveform_collection`` submodules).

Instead of the reference's per-band Python loop over per-window SciPy calls,
the whole problem is expressed as one dense batched computation over a
``(band, window, element-pair)`` grid with static shapes:

- the narrow-band filter bank is applied in the frequency domain from a single
  forward FFT of the raw waveform (`ops.filters`),
- inter-element delays / MdCCM come from batched FFT cross-correlation
  (`ops.xcorr`),
- the slowness inversion is a closed-form batched 2x2 normal-equation solve
  (`ops.solve`), with the robust LTS estimator vectorized as an exact
  elemental-subset sweep + batched concentration steps (`ops.lts`),
- multi-chip scaling shards bands and time segments over a
  ``jax.sharding.Mesh`` with halo exchange (`parallel`).

The public API (`api`) mirrors the reference function-for-function so that a
user of the reference can switch without relearning the interface.
"""

from narrow_band_least_squares_tpu.config import NBLSConfig
from narrow_band_least_squares_tpu.io.stream import ArrayStream

_API_NAMES = (
    "get_freqlist",
    "get_winlenlist",
    "filter_data",
    "get_rij",
    "make_float",
    "write_txtfile",
    "read_txtfile",
    "ltsva",
    "narrow_band_least_squares",
    "narrow_band_least_squares_parallel",
    "set_performance_defaults",
    "PRODUCTION_DEFAULTS",
)


def __getattr__(name):
    # api pulls in jax; keep top-level import light (host-only helpers work
    # without touching the device runtime).
    if name in _API_NAMES:
        from narrow_band_least_squares_tpu import api
        return getattr(api, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__version__ = "0.1.0"

__all__ = [
    "NBLSConfig",
    "ArrayStream",
    "get_freqlist",
    "get_winlenlist",
    "filter_data",
    "get_rij",
    "make_float",
    "write_txtfile",
    "read_txtfile",
    "ltsva",
    "narrow_band_least_squares",
    "narrow_band_least_squares_parallel",
    "set_performance_defaults",
    "PRODUCTION_DEFAULTS",
]
