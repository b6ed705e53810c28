"""Hex lattice index (functions/hexgrid.py)."""

import numpy as np
import pytest

from osm_data_3d_tiles_spark.functions.hexgrid import (
    hex_assign,
    hex_center,
    hex_disk,
    hex_distance,
    hex_ring,
    pack_id,
    unpack_id,
)


class TestLattice:
    def test_centers_round_trip(self):
        qs, rs = np.meshgrid(np.arange(-30, 30), np.arange(-30, 30))
        q, r = qs.ravel(), rs.ravel()
        x, y = hex_center(q, r, size=7.5)
        q2, r2 = hex_assign(x, y, size=7.5)
        assert np.array_equal(q, q2) and np.array_equal(r, r2)

    def test_assignment_is_nearest_center(self):
        rng = np.random.RandomState(3)
        pts = rng.uniform(-100, 100, size=(500, 2))
        size = 9.0
        q, r = hex_assign(pts[:, 0], pts[:, 1], size)
        cx, cy = hex_center(q, r, size)
        d_own = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
        # distance to own center can't exceed circumradius, and must beat
        # all 6 neighbors
        assert (d_own <= size + 1e-9).all()
        from osm_data_3d_tiles_spark.functions.hexgrid import _DIRS

        for dq, dr in _DIRS:
            nx, ny = hex_center(q + dq, r + dr, size)
            d_n = np.hypot(pts[:, 0] - nx, pts[:, 1] - ny)
            assert (d_own <= d_n + 1e-9).all()

    def test_ring_and_disk_sizes(self):
        for k in range(5):
            ring = hex_ring(2, -1, k)
            assert len(ring) == (1 if k == 0 else 6 * k)
            assert (hex_distance(ring[:, 0], ring[:, 1], 2, -1) == k).all()
        disk = hex_disk(0, 0, 4)
        assert len(disk) == 3 * 4 * 5 + 1
        assert len({tuple(c) for c in disk}) == len(disk)

    def test_pack_unpack(self):
        q = np.array([-1000000, 0, 999999])
        r = np.array([999999, -5, 1000000])
        pq, pr = unpack_id(pack_id(q, r))
        assert np.array_equal(pq, q) and np.array_equal(pr, r)
        with pytest.raises(ValueError, match="25-bit"):
            pack_id(np.array([1 << 26]), np.array([0]))

    def test_distance_triangle_axes(self):
        assert hex_distance(0, 0, 3, 0) == 3
        assert hex_distance(0, 0, 0, 3) == 3
        assert hex_distance(0, 0, 3, -3) == 3
        assert hex_distance(0, 0, 2, 2) == 4


class TestSparkSurface:
    def test_hex_counts_match_duckdb(self, spark):
        import duckdb

        from osm_data_3d_tiles_spark.plans.contract import build_queries

        qs = build_queries()
        fn, sql = qs["hex_cell_counts"]
        sdf = fn(spark, "/root/testdata/sf0.001").toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        odf = con.execute(sql).fetchdf()
        cols = sorted(sdf.columns)
        s = sdf[cols].sort_values(cols).reset_index(drop=True)
        o = odf[cols].sort_values(cols).reset_index(drop=True).astype(s.dtypes.to_dict())
        assert s.equals(o)
