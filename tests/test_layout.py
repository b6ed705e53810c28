"""Bucketed-layout tests: the co-located join must be exchange-free and equal
to the plain-join result; a path read (no bucket metadata) must NOT be."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_data_3d_tiles_spark.sinks.layout import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("wh")
    left = spark.range(0, 10_000).select(
        F.col("id").alias("cell"), (F.col("id") % 97).alias("a_val")
    )
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("cell"), (F.col("id") % 89).alias("b_val")
    )
    write_bucketed(left, "t_left", ["cell"], n_buckets=8, sort_cols=["cell"],
                   path=str(wh / "t_left"))
    write_bucketed(right, "t_right", ["cell"], n_buckets=8, sort_cols=["cell"],
                   path=str(wh / "t_right"))
    return left, right


class TestBucketedLayout:
    def test_join_is_exchange_free_and_correct(self, spark, bucketed_tables):
        left, right = bucketed_tables
        joined = bucketed_join(spark, "t_left", "t_right", ["cell"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        assert "SortMergeJoin" in plan and "Bucketed: true" in plan
        want = left.join(right, "cell").count()
        assert joined.count() == want == 5_000

    def test_groupby_on_bucket_key_is_exchange_free(self, spark, bucketed_tables):
        agg = spark.table("t_left").groupBy("cell").agg(F.sum("a_val").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert agg.count() == 10_000

    def test_path_read_loses_bucketing(self, spark, bucketed_tables, tmp_path):
        """Reading the same files by path has no bucket metadata — the join
        plans an Exchange again. Pinned so nobody 'simplifies' the catalog
        read away."""
        loc = (
            spark.sql("DESCRIBE TABLE EXTENDED t_left")
            .filter(F.col("col_name") == "Location")
            .first()["data_type"]
        )
        by_path = spark.read.parquet(loc)
        joined = by_path.join(spark.table("t_right"), "cell")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
