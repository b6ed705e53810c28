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
