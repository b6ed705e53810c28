"""S2 cell index: structural properties of the from-scratch implementation.

No S2 library exists in the sandbox to diff exact ids against, so these pin
the defining invariants of the scheme: face anchors, per-level bijectivity,
Hilbert adjacency of consecutive curve positions, quadratic-projection
round-trip, and parent/child prefix containment.
"""

import numpy as np
import pytest

from osm_data_3d_tiles_spark.functions import s2


def _rand_lonlat(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(-180, 180, n), rng.uniform(-89.9, 89.9, n)


class TestFaceProjection:
    def test_face_anchors(self):
        # axis-direction points land on their face, at the face center
        lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
        lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
        face, i, j = s2.face_ij(lon, lat)
        assert face.tolist() == [0, 1, 2, 3, 4, 5]
        c = 1 << (s2.MAX_LEVEL - 1)  # s = t = 0.5
        # lon=180deg is sin(pi)=1.2e-16 off the exact center in float radians
        assert (np.abs(i - c) <= 1).all() and (np.abs(j - c) <= 1).all()

    def test_level0_ids(self):
        lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
        lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
        ids = s2.cell_id(lon, lat, 0).view(np.uint64)
        want = (np.arange(6, dtype=np.uint64) << np.uint64(61)) | np.uint64(1 << 60)
        assert (ids == want).all()

    def test_st_uv_round_trip(self):
        u = np.linspace(-1, 1, 1001)
        back = s2._uv_from_st(s2._st_from_uv(u))
        np.testing.assert_allclose(back, u, atol=1e-12)

    def test_every_face_reachable_and_uv_bounded(self):
        lon, lat = _rand_lonlat(20000)
        x, y, z = s2._xyz(lon, lat)
        face, u, v = s2._face_uv(x, y, z)
        assert set(face.tolist()) == set(range(6))
        assert (np.abs(u) <= 1 + 1e-12).all() and (np.abs(v) <= 1 + 1e-12).all()


class TestHilbert:
    def test_bijective_per_level(self):
        # every (face, i, j) at level 3 gets a distinct id, and inverts back
        n = 1 << 3
        f, i, j = np.meshgrid(np.arange(6), np.arange(n), np.arange(n), indexing="ij")
        f, i, j = f.ravel(), i.ravel(), j.ravel()
        shift = s2.MAX_LEVEL - 3
        ids = s2.cell_id_from_face_ij(f, i << shift, j << shift, 3)
        assert len(np.unique(ids)) == 6 * n * n
        f2, i2, j2 = s2.face_ij_from_cell(ids, 3)
        assert (f2 == f).all() and (i2 == i).all() and (j2 == j).all()

    def test_curve_continuity(self):
        # consecutive Hilbert positions at level 6 are grid-adjacent on the
        # face — THE property that makes id-sorted storage spatially local
        level, n = 6, 1 << 6
        for face in range(6):
            pos = np.arange(n * n, dtype=np.uint64)
            shift = np.uint64(2 * (s2.MAX_LEVEL - level))
            u = (
                (np.uint64(face) << np.uint64(61))
                | (pos << (shift + np.uint64(1)))
                | np.uint64(1 << int(shift))
            )
            _, i, j = s2.face_ij_from_cell(u.view(np.int64), level)
            step = np.abs(np.diff(i)) + np.abs(np.diff(j))
            assert (step == 1).all(), f"face {face}: curve jumps"

    def test_level_of(self):
        lon, lat = _rand_lonlat(100)
        for level in (0, 5, 12, 30):
            assert (s2.level_of(s2.cell_id(lon, lat, level)) == level).all()


class TestHierarchy:
    def test_parent_equals_direct_assignment(self):
        lon, lat = _rand_lonlat(50000)
        fine = s2.cell_id(lon, lat, 14)
        for coarse in (12, 8, 3, 0):
            np.testing.assert_array_equal(
                s2.parent(fine, coarse), s2.cell_id(lon, lat, coarse)
            )

    def test_parent_ij_is_prefix(self):
        lon, lat = _rand_lonlat(20000)
        ids = s2.cell_id(lon, lat, 10)
        f10, i10, j10 = s2.face_ij_from_cell(ids, 10)
        f6, i6, j6 = s2.face_ij_from_cell(s2.parent(ids, 6), 6)
        assert (f6 == f10).all()
        assert (i6 == i10 >> 4).all() and (j6 == j10 >> 4).all()

    def test_bad_level_raises(self):
        with pytest.raises(ValueError, match="level"):
            s2.cell_id_from_face_ij(np.array([0]), np.array([0]), np.array([0]), 31)


class TestSparkSurface:
    def test_column_matches_numpy(self, spark):
        lon, lat = _rand_lonlat(500)
        import pandas as pd

        df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat, "k": range(500)}))
        got = (
            df.select("k", s2.s2_cell_col("lon", "lat", 12).alias("cell"))
            .toPandas()
            .sort_values("k")
        )
        np.testing.assert_array_equal(got.cell.to_numpy(), s2.cell_id(lon, lat, 12))

    def test_parent_col(self, spark):
        lon, lat = _rand_lonlat(200)
        import pandas as pd

        df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat, "k": range(200)}))
        got = (
            df.select(
                "k",
                s2.s2_parent_col(s2.s2_cell_col("lon", "lat", 12), 7).alias("p"),
            )
            .toPandas()
            .sort_values("k")
        )
        np.testing.assert_array_equal(got.p.to_numpy(), s2.cell_id(lon, lat, 7))
