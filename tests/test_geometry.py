"""Geometry tests: Vincenty inverse, rij projection, co-array, conventions."""

import numpy as np
import pytest

from narrow_band_least_squares_tpu.utils.geometry import (
    coarray,
    get_rij,
    pair_indices,
    slowness_to_vel_baz,
    vincenty_inverse,
)


class TestVincenty:
    def test_known_geodesic_equator(self):
        # 1 degree of longitude on the equator on WGS84 ~ 111319.49 m
        d, az12, az21 = vincenty_inverse(0.0, 0.0, 0.0, 1.0)
        assert d == pytest.approx(111319.49, rel=1e-6)
        assert az12 == pytest.approx(90.0, abs=1e-9)

    def test_known_geodesic_meridian(self):
        # 1 degree of latitude from the equator ~ 110574.4 m on WGS84
        d, az12, _ = vincenty_inverse(0.0, 0.0, 1.0, 0.0)
        assert d == pytest.approx(110574.4, rel=1e-5)
        assert az12 == pytest.approx(0.0, abs=1e-9)

    def test_symmetry(self):
        d1, a12, a21 = vincenty_inverse(64.87, -147.86, 64.9, -147.8)
        d2, b12, b21 = vincenty_inverse(64.9, -147.8, 64.87, -147.86)
        assert d1 == pytest.approx(d2, rel=1e-9)
        assert a12 == pytest.approx(b21, abs=1e-6)

    def test_coincident(self):
        assert vincenty_inverse(10.0, 10.0, 10.0, 10.0)[0] == 0.0


class TestGetRij:
    def test_zero_mean_and_shape(self):
        lats = [64.87, 64.88, 64.86, 64.875]
        lons = [-147.86, -147.85, -147.87, -147.84]
        rij = get_rij(lats, lons, 4)
        assert rij.shape == (2, 4)
        np.testing.assert_allclose(rij.mean(axis=1), 0.0, atol=1e-12)

    def test_east_axis_convention(self):
        # second element due east of first -> positive X, ~zero Y
        lats = [0.0, 0.0]
        lons = [0.0, 0.01]
        rij = get_rij(lats, lons, 2)
        dx = rij[0, 1] - rij[0, 0]
        dy = rij[1, 1] - rij[1, 0]
        assert dx == pytest.approx(1.11319, rel=1e-4)  # km
        assert abs(dy) < 1e-9

    def test_north_axis_convention(self):
        lats = [0.0, 0.01]
        lons = [0.0, 0.0]
        rij = get_rij(lats, lons, 2)
        dx = rij[0, 1] - rij[0, 0]
        dy = rij[1, 1] - rij[1, 0]
        assert dy == pytest.approx(1.10574, rel=1e-4)
        assert abs(dx) < 1e-9

    def test_mismatch_raises(self):
        with pytest.raises(ValueError):
            get_rij([0.0], [0.0, 1.0], 2)


class TestCoarray:
    def test_pairs_lexicographic(self):
        pairs = pair_indices(4)
        expected = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        assert [tuple(p) for p in pairs] == expected

    def test_design_matrix(self):
        rij = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 2.0]])
        X, pairs = coarray(rij)
        assert X.shape == (3, 2)
        np.testing.assert_allclose(X[0], [1.0, 0.0])   # pair (0,1)
        np.testing.assert_allclose(X[1], [0.0, 2.0])   # pair (0,2)
        np.testing.assert_allclose(X[2], [-1.0, 2.0])  # pair (1,2)


class TestSlownessConventions:
    @pytest.mark.parametrize("baz,vel", [(0.0, 0.3), (90.0, 0.34), (230.0, 0.4), (315.0, 0.25)])
    def test_roundtrip(self, baz, vel):
        # propagation direction = baz + 180
        az_prop = np.radians((baz + 180.0) % 360.0)
        s = np.array([np.sin(az_prop), np.cos(az_prop)]) / vel
        v, b = slowness_to_vel_baz(s[0], s[1])
        assert v == pytest.approx(vel, rel=1e-12)
        circ_diff = (b - baz + 180.0) % 360.0 - 180.0
        assert abs(circ_diff) < 1e-9
