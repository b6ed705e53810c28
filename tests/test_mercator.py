"""Mercator / tile-grid / ECEF golden tests."""

import math

import numpy as np
import pytest

from osm_data_3d_tiles_spark.functions import ecef, mercator as m


class TestProjection:
    def test_roundtrip(self):
        lon = np.array([4.85, -122.33, 0.0, 179.9])
        lat = np.array([45.75, 47.6, 0.0, -85.0])
        x, y = m.lonlat_to_3857(lon, lat)
        lon2, lat2 = m.merc_to_lonlat(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_known_values(self):
        x, y = m.lonlat_to_3857(np.array([0.0]), np.array([0.0]))
        assert x[0] == 0.0 and abs(y[0]) < 1e-6
        x, y = m.lonlat_to_3857(np.array([180.0]), np.array([0.0]))
        assert x[0] == pytest.approx(m.HALF_SIZE)

    def test_lyon_extent_in_range(self):
        lon, lat = m.merc_to_lonlat(
            np.array([m.LYON_EXTENT[0], m.LYON_EXTENT[2]]),
            np.array([m.LYON_EXTENT[1], m.LYON_EXTENT[3]]),
        )
        assert 4.0 < lon[0] < lon[1] < 5.5
        assert 45.0 < lat[0] < lat[1] < 46.5


class TestTileGrid:
    def test_origin_tile(self):
        tx, ty = m.tile_xy(np.array([-m.HALF_SIZE + 1.0]), np.array([m.HALF_SIZE - 1.0]), 16)
        assert (tx[0], ty[0]) == (0, 0)

    def test_center(self):
        tx, ty = m.tile_xy(np.array([1.0]), np.array([-1.0]), 16)
        assert (tx[0], ty[0]) == (32768, 32768)

    def test_extent_roundtrip(self):
        ext = m.tile_extent(16, 33825, 23456)
        cx, cy = (ext[0] + ext[2]) / 2, (ext[1] + ext[3]) / 2
        tx, ty = m.tile_xy(np.array([cx]), np.array([cy]), 16)
        assert (tx[0], ty[0]) == (33825, 23456)

    def test_parent_child_alignment(self):
        """A z12 tile's extent maps to exactly its 16×16 z16 children."""
        ext12 = m.tile_extent(12, 2114, 1466)
        rng = m.tile_range_for_extent(ext12, 16)
        assert rng == (2114 * 16, 1466 * 16, 2114 * 16 + 15, 1466 * 16 + 15)

    def test_for_each_tile_coord_order(self):
        """x outer, y inner — the OL forEachTileCoord order that fixes seeding
        (and therefore tile-ownership) determinism."""
        ext = m.tile_extent(12, 2114, 1466)
        coords = m.for_each_tile_coord(ext, 16)
        assert len(coords) == 256
        assert coords[0] == (16, 2114 * 16, 1466 * 16)
        assert coords[1] == (16, 2114 * 16, 1466 * 16 + 1)  # y advances first
        assert coords[16] == (16, 2114 * 16 + 1, 1466 * 16)

    def test_cell_id_unique(self):
        tx = np.array([0, 1, 2**16 - 1])
        ty = np.array([5, 5, 2**16 - 1])
        ids = m.cell_id(tx, ty, 16)
        assert len(set(ids.tolist())) == 3
        # unpack check
        assert (ids[0] >> 58) == 16
        assert ((ids[2] >> 29) & ((1 << 29) - 1)) == 2**16 - 1


class TestECEF:
    def test_two_e2_variants_differ(self):
        """Both eccentricity constants in the reference are load-bearing: they must
        produce (slightly) different results, each matching its own formula."""
        x1, y1, z1 = ecef.lonlat_to_ecef_deg(4.85, 45.75)
        x2, y2, z2 = ecef.lonlat_to_ecef_rad(math.radians(4.85), math.radians(45.75))
        assert abs(x1 - x2) < 0.02  # same point, sub-cm difference
        assert (x1, y1, z1) != (x2, y2, z2)

    def test_equator_prime_meridian(self):
        x, y, z = ecef.lonlat_to_ecef_rad(0.0, 0.0)
        assert x == pytest.approx(6378137.0)
        assert y == 0.0 and z == 0.0

    def test_enu_basis_orthonormal(self):
        b = ecef.enu_basis(math.radians(4.85), math.radians(45.75))
        np.testing.assert_allclose(b.T @ b, np.eye(3), atol=1e-12)

    def test_jacobian_scale(self):
        """At Lyon's latitude, 1 Mercator meter ≈ cos(lat) true meters east."""
        x0 = (m.LYON_EXTENT[0] + m.LYON_EXTENT[2]) / 2
        y0 = (m.LYON_EXTENT[1] + m.LYON_EXTENT[3]) / 2
        a, c0 = ecef.jacobian_3857_to_enu(x0, y0, 150.0)
        lon, lat = m.merc_to_lonlat(np.array([x0]), np.array([y0]))
        assert a[0, 0] == pytest.approx(math.cos(math.radians(lat[0])), rel=5e-3)
        assert a[1, 1] == pytest.approx(math.cos(math.radians(lat[0])), rel=5e-3)
        assert a[2, 2] == 1.0
        assert np.linalg.norm(c0) == pytest.approx(6367000, rel=0.01)
