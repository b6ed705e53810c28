"""Tileset structure tests (SURVEY.md §5.1) over a fixed extent."""

import json
import math

import numpy as np
import pytest

from osm_data_3d_tiles_spark.functions import mercator as m
from osm_data_3d_tiles_spark.plans import tileset as ts
from osm_data_3d_tiles_spark.sources.fixtures import FIXTURE_EXTENT, FIXTURE_Z12


class TestSubtileBox:
    def test_structure(self):
        sub = ts.build_subtile_json(FIXTURE_EXTENT, "mercator")
        assert sub["asset"] == {"version": "1.0"}
        assert sub["geometricError"] == 512
        root = sub["root"]
        assert root["refine"] == "ADD"
        assert len(root["children"]) == 256  # 16×16 z16 children of one z12 tile
        child = root["children"][0]
        x0, y0 = FIXTURE_Z12[0] * 16, FIXTURE_Z12[1] * 16
        assert child["content"]["uri"] == f"16_{x0}_{y0}.b3dm"
        assert child["refine"] == "ADD"
        assert child["geometricError"] == 512

    def test_box_volume(self):
        sub = ts.build_subtile_json(FIXTURE_EXTENT, "mercator")
        w = FIXTURE_EXTENT[2] - FIXTURE_EXTENT[0]
        h = FIXTURE_EXTENT[3] - FIXTURE_EXTENT[1]
        box = sub["root"]["boundingVolume"]["box"]
        assert box == [w / 2, h / 2, 150.0, w / 2, 0, 0, 0, h / 2, 0, 0, 0, 150.0]
        # child box uses the z16 extent and TILE_HEIGHT 300
        cbox = sub["root"]["children"][0]["boundingVolume"]["box"]
        span = m.tile_span(16)
        assert cbox[0] == pytest.approx(span / 2)
        assert cbox[2] == 150.0

    def test_child_transform_is_delta_to_parent_center(self):
        sub = ts.build_subtile_json(FIXTURE_EXTENT, "mercator")
        child = sub["root"]["children"][0]
        t = child["transform"]
        # column-major Matrix4: translation in elements 12..14
        px = (FIXTURE_EXTENT[0] + FIXTURE_EXTENT[2]) / 2
        py = (FIXTURE_EXTENT[1] + FIXTURE_EXTENT[3]) / 2
        ext0 = m.tile_extent(16, FIXTURE_Z12[0] * 16, FIXTURE_Z12[1] * 16)
        cx, cy = (ext0[0] + ext0[2]) / 2, (ext0[1] + ext0[3]) / 2
        assert t[12] == pytest.approx(cx - px)
        assert t[13] == pytest.approx(cy - py)
        assert t[14] == 0.0

    def test_children_order_is_foreach_order(self):
        sub = ts.build_subtile_json(FIXTURE_EXTENT, "mercator")
        uris = [c["content"]["uri"] for c in sub["root"]["children"]]
        coords = m.for_each_tile_coord(FIXTURE_EXTENT, 16)
        assert uris == [f"{z}_{x}_{y}.b3dm" for z, x, y in coords]


class TestSubtileRegion:
    def test_region_volume_radians(self):
        sub = ts.build_subtile_json(FIXTURE_EXTENT, "region")
        region = sub["root"]["boundingVolume"]["region"]
        lon, lat = m.merc_to_lonlat(
            np.array([FIXTURE_EXTENT[0], FIXTURE_EXTENT[2]]),
            np.array([FIXTURE_EXTENT[1], FIXTURE_EXTENT[3]]),
        )
        assert region[0] == pytest.approx(math.radians(lon[0]))
        assert region[3] == pytest.approx(math.radians(lat[1]))
        assert region[4] == 0 and region[5] == 300.0

    def test_root_matrix_is_enu_at_center(self):
        sub = ts.build_subtile_json(FIXTURE_EXTENT, "region")
        t = sub["root"]["transform"]
        rot = np.array([[t[0], t[4], t[8]], [t[1], t[5], t[9]], [t[2], t[6], t[10]]])
        np.testing.assert_allclose(rot.T @ rot, np.eye(3), atol=1e-12)  # orthonormal
        center = np.array([t[12], t[13], t[14]])
        assert np.linalg.norm(center) == pytest.approx(6368000, rel=0.01)

    def test_child_transform_rotation_is_jacobian(self):
        sub = ts.build_subtile_json(FIXTURE_EXTENT, "region")
        child = sub["root"]["children"][0]
        t = child["transform"]
        # Jacobian block: a[0,0] ≈ cos(lat) (mercator shrink), a[2,2] = 1
        assert t[0] == pytest.approx(math.cos(math.radians(45.75)), rel=5e-3)
        assert t[10] == 1.0


class TestLambert93:
    def test_false_origin(self):
        """The projection origin (lon0=3, lat0=46.5) maps exactly to the false
        origin (700000, 6600000) — a defining property of EPSG:2154."""
        from osm_data_3d_tiles_spark.functions import lambert

        e, n = lambert.lonlat_to_lambert93(3.0, 46.5)
        assert float(e) == pytest.approx(700000.0, abs=1e-6)
        assert float(n) == pytest.approx(6600000.0, abs=1e-6)

    def test_unit_scale_on_standard_parallels(self):
        """LCC-2SP is true-to-scale on both standard parallels: projected
        distance along lat 49 and lat 44 equals the ellipsoidal parallel arc."""
        from osm_data_3d_tiles_spark.functions import lambert

        for lat in (49.0, 44.0):
            dlon = 0.001
            e1, n1 = lambert.lonlat_to_lambert93(3.0, lat)
            e2, n2 = lambert.lonlat_to_lambert93(3.0 + dlon, lat)
            proj_d = math.hypot(float(e2 - e1), float(n2 - n1))
            phi = math.radians(lat)
            nu = lambert.A / math.sqrt(1 - lambert.E2 * math.sin(phi) ** 2)
            arc = nu * math.cos(phi) * math.radians(dlon)
            assert proj_d == pytest.approx(arc, rel=1e-9)

    def test_north_increases_with_latitude(self):
        from osm_data_3d_tiles_spark.functions import lambert

        _, n1 = lambert.lonlat_to_lambert93(4.8, 45.0)
        _, n2 = lambert.lonlat_to_lambert93(4.8, 46.0)
        assert float(n2) > float(n1)


class TestSubtileCustomBox:
    def test_structure_and_volume(self):
        from osm_data_3d_tiles_spark.functions import lambert

        sub = ts.build_subtile_json(FIXTURE_EXTENT, "custombox")
        assert len(sub["root"]["children"]) == 256
        box = sub["root"]["boundingVolume"]["box"]
        min_x, min_y, max_x, max_y = lambert.transform_extent_to_lambert93(FIXTURE_EXTENT)
        w, h = max_x - min_x, max_y - min_y
        # customBox.ts:84-105 centers the box at (w/2, h/2, zmax/2)
        assert box[0] == pytest.approx(w / 2) and box[1] == pytest.approx(h / 2)
        assert box[3] == pytest.approx(w / 2) and box[7] == pytest.approx(h / 2)
        assert box[2] == 150.0 and box[11] == 150.0

    def test_root_is_translation_to_projected_center(self):
        from osm_data_3d_tiles_spark.functions import lambert

        root = ts.custombox_tileset_root(FIXTURE_EXTENT)
        t = root["content"]["transform"]
        min_x, min_y, max_x, max_y = lambert.transform_extent_to_lambert93(FIXTURE_EXTENT)
        assert t[12] == pytest.approx((min_x + max_x) / 2)
        assert t[13] == pytest.approx((min_y + max_y) / 2)
        assert t[:12] == [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0]

    def test_child_jacobian_and_delta(self):
        from osm_data_3d_tiles_spark.functions import lambert

        sub = ts.build_subtile_json(FIXTURE_EXTENT, "custombox")
        child = sub["root"]["children"][0]
        t = child["transform"]
        coord = m.for_each_tile_coord(FIXTURE_EXTENT, 16)[0]
        ext = m.tile_extent(*coord)
        p0, vx, vy = lambert.jacobian_3857_to_lambert93(
            (ext[0] + ext[2]) / 2, (ext[1] + ext[3]) / 2
        )
        assert t[0] == pytest.approx(vx[0]) and t[1] == pytest.approx(vx[1])
        assert t[4] == pytest.approx(vy[0]) and t[5] == pytest.approx(vy[1])
        assert t[10] == 1.0
        # mercator stretch undone: the Jacobian's x column has length ≈ cos(lat)
        assert math.hypot(t[0], t[1]) == pytest.approx(
            math.cos(math.radians(45.75)), rel=5e-3
        )
        root = ts.custombox_tileset_root(FIXTURE_EXTENT)
        assert t[12] == pytest.approx(p0[0] - root["center"][0])
        assert t[13] == pytest.approx(p0[1] - root["center"][1])


class TestRootTileset:
    def test_root_structure_and_identity_transform(self, tmp_path):
        tileset, subtiles = ts.build_root_tileset(FIXTURE_EXTENT, "mercator")
        assert tileset["root"]["transform"] == [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1]
        assert len(tileset["root"]["children"]) == 1  # extent = exactly one z12 tile
        child = tileset["root"]["children"][0]
        z12x, z12y = FIXTURE_Z12
        assert child["content"]["uri"] == f"subtiles/12_{z12x}_{z12y}.json"
        assert list(subtiles.keys()) == [f"12_{z12x}_{z12y}.json"]

    def test_write_round_trip(self, tmp_path):
        path = ts.write_tileset(str(tmp_path), FIXTURE_EXTENT, "mercator")
        with open(path) as f:
            tileset = json.load(f)
        assert tileset["asset"]["version"] == "1.0"
        sub_name = tileset["root"]["children"][0]["content"]["uri"].split("/")[-1]
        with open(tmp_path / "subtiles" / sub_name) as f:
            sub = json.load(f)
        assert len(sub["root"]["children"]) == 256

    def test_larger_extent_multiple_subtiles(self):
        tileset, subtiles = ts.build_root_tileset(m.LYON_EXTENT, "mercator")
        coords = m.for_each_tile_coord(m.LYON_EXTENT, 12)
        assert len(tileset["root"]["children"]) == len(coords) == len(subtiles)
        assert len(coords) > 1
