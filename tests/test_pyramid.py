"""Tile-pyramid rollup."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_data_3d_tiles_spark.operators.pyramid import pyramid_rollup


def _points(spark, n=500, z_leaf=6):
    side = 1 << z_leaf
    rows = [(i, (i * 2654435761) % side, (i * 1597334677) % side) for i in range(n)]
    return spark.createDataFrame(rows, ["pid", "tile_x", "tile_y"]), rows


class TestPyramidRollup:
    def test_matches_bruteforce_all_levels(self, spark):
        df, rows = _points(spark)
        got = (
            pyramid_rollup(df, z_leaf=6, z_min=2, measure_col="pid")
            .toPandas()
            .sort_values(["z", "tile_x", "tile_y"])
            .reset_index(drop=True)
        )
        pdf = pd.DataFrame(rows, columns=["pid", "tile_x", "tile_y"])
        wants = []
        for z in range(6, 1, -1):
            dz = 6 - z
            g = pdf.assign(tile_x=pdf.tile_x // (1 << dz), tile_y=pdf.tile_y // (1 << dz))
            w = (
                g.groupby(["tile_x", "tile_y"])
                .agg(n=("pid", "size"), m_sum=("pid", "sum"), m_min=("pid", "min"), m_max=("pid", "max"))
                .reset_index()
            )
            w.insert(0, "z", z)
            wants.append(w)
        want = (
            pd.concat(wants)
            .sort_values(["z", "tile_x", "tile_y"])
            .reset_index(drop=True)
            .astype({"z": "int32", "tile_x": "int64", "tile_y": "int64"})
        )
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)

    def test_parent_equals_sum_of_children(self, spark):
        df, _ = _points(spark, n=300)
        out = pyramid_rollup(df, z_leaf=6, z_min=4).toPandas()
        for z in (5, 4):
            child = out[out.z == z + 1].copy()
            child["px"], child["py"] = child.tile_x // 2, child.tile_y // 2
            rolled = child.groupby(["px", "py"])["n"].sum().reset_index()
            parent = out[out.z == z][["tile_x", "tile_y", "n"]]
            merged = rolled.merge(
                parent, left_on=["px", "py"], right_on=["tile_x", "tile_y"], how="outer"
            )
            assert (merged["n_x"] == merged["n_y"]).all()

    def test_count_only_columns(self, spark):
        df, _ = _points(spark, n=50)
        out = pyramid_rollup(df, z_leaf=4, z_min=4)
        assert out.columns == ["z", "tile_x", "tile_y", "n"]
        assert out.agg(F.sum("n")).first()[0] == 50

    def test_bad_range_raises(self, spark):
        df, _ = _points(spark, n=10)
        with pytest.raises(ValueError, match="z_min"):
            pyramid_rollup(df, z_leaf=4, z_min=5)

    def test_single_raw_scan_plan(self, spark):
        """Coarse levels must derive from the cached leaf aggregate: the
        unioned plan shows InMemoryTableScan branches, not repeated scans of
        the raw input."""
        df, _ = _points(spark, n=50)
        plan = pyramid_rollup(df, z_leaf=6, z_min=4)._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
