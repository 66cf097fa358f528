"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding is
exercised without TPU hardware (SURVEY §7.5).  These env vars must be set
before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force even when a TPU is attached
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon TPU plugin (sitecustomize) forces jax_platforms at interpreter
# start, overriding the env var — override it back before backend init.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from narrow_band_least_squares_tpu.io.synthetic import synthetic_plane_wave


def pytest_addoption(parser):
    parser.addoption(
        "--write-golden", action="store_true", default=False,
        help="rewrite tests/data/golden.json from the current outputs",
    )


@pytest.fixture(scope="session")
def small_stream():
    """4-element array, 4 minutes @ 10 Hz — quick CPU-oracle-sized workload."""
    return synthetic_plane_wave(
        nchans=4, duration_s=240.0, fs=10.0, baz_deg=230.0,
        trace_vel_kms=0.34, f0=0.6, bandwidth=0.8, snr=8.0,
        aperture_km=2.0, seed=7,
    )


@pytest.fixture(scope="session")
def outlier_stream():
    """6-element array with one incoherent element, for LTS flag tests."""
    return synthetic_plane_wave(
        nchans=6, duration_s=240.0, fs=10.0, baz_deg=120.0,
        trace_vel_kms=0.30, f0=0.6, bandwidth=0.8, snr=15.0,
        aperture_km=2.5, seed=11, outlier_channels=(2,),
    )
