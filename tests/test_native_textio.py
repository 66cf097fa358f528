"""Native (C++) TSV codec vs the pure-Python path: identical bytes, faster."""

import os
import time

import numpy as np
import pytest

from narrow_band_least_squares_tpu.io.textio import (
    read_txtfile,
    write_txtfile,
)

native = pytest.importorskip("narrow_band_least_squares_tpu.native")


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib(auto_build=True)
    if l is None:
        pytest.skip("native library could not be built (no g++?)")
    return l


@pytest.fixture()
def payload():
    rng = np.random.default_rng(5)
    nbands, width = 4, 60
    freqlist = [0.1, 0.2, 0.4, 0.8, 1.6]
    num = [30, 40, 50, 60]
    vel = rng.uniform(0.2, 0.5, (nbands, width))
    baz = rng.uniform(0, 360, (nbands, width))
    mdccm = rng.uniform(0, 1, (nbands, width))
    t = 17884.0 + np.cumsum(rng.uniform(0.001, 0.002, (nbands, width)), axis=1)
    return freqlist, num, vel, baz, mdccm, t


def test_bytes_identical_to_python(lib, payload, tmp_path):
    freqlist, num, vel, baz, mdccm, t = payload
    p_native = write_txtfile(str(tmp_path), "n", vel, baz, mdccm, t,
                             freqlist, num, use_native=True)
    p_python = write_txtfile(str(tmp_path), "p", vel, baz, mdccm, t,
                             freqlist, num, use_native=False)
    with open(p_native, "rb") as f:
        a = f.read()
    with open(p_python, "rb") as f:
        b = f.read()
    assert a == b


def test_native_roundtrip(lib, payload, tmp_path):
    freqlist, num, vel, baz, mdccm, t = payload
    write_txtfile(str(tmp_path), "r", vel, baz, mdccm, t, freqlist, num)
    out = read_txtfile(str(tmp_path), "r", use_native=True)
    ref = read_txtfile(str(tmp_path), "r", use_native=False)
    for a, b in zip(out[:4], ref[:4]):
        np.testing.assert_array_equal(a, b)
    nbands = len(num)
    for b_i in range(nbands):
        np.testing.assert_allclose(out[0][b_i, : num[b_i]],
                                   vel[b_i, : num[b_i]], rtol=0)


def test_native_is_faster_at_scale(lib, tmp_path):
    rng = np.random.default_rng(0)
    nbands, width = 8, 20000  # ~monitoring-scale row count
    freqlist = list(np.linspace(0.1, 5.0, nbands + 1))
    num = [width] * nbands
    arrs = [rng.uniform(size=(nbands, width)) for _ in range(4)]
    t0 = time.perf_counter()
    write_txtfile(str(tmp_path), "big_n", *arrs, freqlist, num, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    write_txtfile(str(tmp_path), "big_p", *arrs, freqlist, num, use_native=False)
    t_python = time.perf_counter() - t0
    assert t_native < t_python, (t_native, t_python)
