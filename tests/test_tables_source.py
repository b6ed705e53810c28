"""Catalog-aware table source: path vs dotted-name routing, pages contract,
column pruning, time-travel gating."""

from __future__ import annotations

import datetime

import pytest

from osm_data_3d_tiles_spark.sources.tables import read_pages, read_table


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("tables") / "pages.parquet")
    spark.createDataFrame(
        [
            ("http://a", datetime.datetime(2024, 1, 1), b"<html>A</html>", "A", "en"),
            ("http://b", datetime.datetime(2024, 1, 2), b"<html>B</html>", "B", "fr"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).write.mode("overwrite").parquet(p)
    return p


class TestReadTable:
    def test_path_routes_to_parquet(self, spark, pages_path):
        assert read_table(spark, pages_path).count() == 2

    def test_dotted_name_routes_to_catalog(self, spark, pages_path):
        spark.read.parquet(pages_path).write.mode("overwrite").saveAsTable(
            "test_tables_pages"
        )
        try:
            df = read_table(spark, "test_tables_pages")
            assert df.count() == 2
        finally:
            spark.sql("DROP TABLE IF EXISTS test_tables_pages")

    def test_time_travel_rejected_on_paths(self, spark, pages_path):
        with pytest.raises(ValueError, match="Iceberg catalog table"):
            read_table(spark, pages_path, snapshot_id=123)

    def test_pages_contract_enforced(self, spark, tmp_path):
        bad = str(tmp_path / "bad.parquet")
        spark.createDataFrame([("u",)], "url string").write.parquet(bad)
        with pytest.raises(ValueError, match="missing required columns"):
            read_pages(spark, bad)

    def test_pages_column_pruning_reaches_scan(self, spark, pages_path):
        df = read_pages(spark, pages_path, columns=("url", "text"))
        assert df.columns == ["url", "text"]
        plan = df._jdf.queryExecution().executedPlan().toString()
        # html (the fat binary column) must not be read
        assert "ReadSchema" in plan and "html" not in plan
        assert df.count() == 2
