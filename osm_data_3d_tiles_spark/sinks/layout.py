"""Bucketed table layout — shuffle-free co-located joins for repeated keys.

At 10^12 rows the flagship join itself never shuffles the fact table (the
buildings-by-cell dimension is broadcast), but everything DOWNSTREAM of the
join — ownership windows, per-tile construction, batch tables, zonal rollups —
re-keys on the same tile/cell columns over and over. Persisting the hot tables
bucketed by that key makes every later equi-join / groupBy on it exchange-free:
Spark's bucketing contract (`DataFrameWriter.bucketBy` + saveAsTable) records
the hash-partitioning in the catalog, and the planner drops the Exchange on
both sides when bucket specs line up (same column, bucket counts equal or an
integer multiple with `spark.sql.bucketing.coalesceBucketedTableScan.enabled`).

This is the parquet/HMS-catalog equivalent of the Iceberg `bucket(N, col)`
partition transform the north rule's ingest table would use.

Local caveat baked into the tests: bucketed reads come from the session
catalog (`spark.table`), not `spark.read.parquet` — a path read has no bucket
metadata and silently reintroduces the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 256,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist `df` hash-bucketed by `bucket_cols` (optionally sorted within
    buckets — sorted buckets additionally let sort-merge joins skip the Sort).

    n_buckets sizes the write-side parallelism ceiling for later joins: pick
    ≈ (table bytes / 256 MB) at the target scale; 256 here is a sandbox-sized
    stand-in (the cluster value rides spark-submit conf, not code).
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: list[str]) -> DataFrame:
    """Join two tables bucketed on `on` as a co-located sort-merge join — the
    planner drops both shuffle Exchanges (and, with sorted buckets, both
    Sorts) when the bucket specs match. The MERGE hint pins the SMJ path:
    below the broadcast threshold the planner would otherwise pick a
    BroadcastHashJoin and mark the scans `Bucketed: false (disabled by query
    planner)` — correct, but not the layout being exercised here."""
    return spark.table(left_table).hint("merge").join(spark.table(right_table), on)
