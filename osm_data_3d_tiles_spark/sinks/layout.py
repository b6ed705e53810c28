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
from pyspark.sql import functions as F


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


def write_clustered(
    df: DataFrame, path: str, cell_col: str = "cell", prefix_shift: int = 48
) -> None:
    """Persist `df` spatially CLUSTERED by a space-filling-curve cell id:
    directory-partitioned on the cell's high bits, sorted by the full cell
    within files.

    This is the read-path layout lever at 100 TB: both our hex lattice ids
    (functions/hexgrid.py) and S2 ids (functions/s2.py) are Hilbert/lattice
    curves, so a spatial range is a small set of contiguous id ranges — with
    this layout a range scan (a) prunes whole directories via the
    `cell_prefix` partition column (Catalyst PartitionFilters, no file even
    listed), and (b) prunes row groups inside surviving files via parquet
    min/max stats on the sorted `cell` column (PushedFilters). It is the
    parquet-path equivalent of Iceberg's `truncate(cell)` partition
    transform + a sort order on cell.

    `prefix_shift` trades directory count against pruning granularity: keep
    distinct prefixes ~ O(10^3-10^4) at the target scale (small-files rule).
    The repartition on cell_prefix means one task owns each directory, so
    files stay few and internally sorted.
    """
    prefix = F.shiftrightunsigned(F.col(cell_col).cast("long"), prefix_shift)
    (
        df.withColumn("cell_prefix", prefix)
        .repartition("cell_prefix")
        .sortWithinPartitions("cell_prefix", cell_col)
        .write.mode("overwrite")
        .partitionBy("cell_prefix")
        .parquet(path)
    )


def read_cell_range(
    spark: SparkSession,
    path: str,
    lo: int,
    hi: int,
    cell_col: str = "cell",
    prefix_shift: int = 48,
) -> DataFrame:
    """Scan a write_clustered layout for lo <= cell <= hi.

    States BOTH predicates explicitly: the derived prefix bounds (so the
    partition-column pruning fires — Catalyst does not infer them from the
    cell predicate) and the exact cell range (pushed to parquet row-group
    stats). Returns the original schema (cell_prefix dropped).
    """
    if lo > hi:
        raise ValueError(f"empty range: lo {lo} > hi {hi}")
    if lo < 0 or hi < 0:
        raise ValueError("cell ids are unsigned-interpreted; need lo, hi >= 0")
    plo, phi = lo >> prefix_shift, hi >> prefix_shift
    return (
        spark.read.parquet(path)
        .filter(
            (F.col("cell_prefix") >= plo)
            & (F.col("cell_prefix") <= phi)
            & (F.col(cell_col) >= lo)
            & (F.col(cell_col) <= hi)
        )
        .drop("cell_prefix")
    )


def compact_layout(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~target_bytes files (the classic
    small-files maintenance pass — the parquet-path analog of Iceberg's
    rewrite_data_files). Returns the number of output partitions written.

    Incremental ingest (streaming micro-batches, per-task partitionBy
    writes) leaves thousands of KB-sized files; at 100 TB that turns every
    scan into an open/footer-parse storm and starves the scheduler with
    tiny splits. The rewrite sizes output partitions from the layout's
    CURRENT bytes (file metadata only — no data read for the estimate) and
    re-sorts within partitions when `sort_cols` is given so min/max
    row-group pruning survives compaction.

    Writes to `out_path` (swap-on-success is the caller's move): a
    maintenance job must never destroy the only copy mid-rewrite.
    """
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    if total == 0:
        # os.walk sees nothing for non-local URIs (hdfs://, s3a://) or an
        # empty dir — sizing from 0 would repartition the WHOLE dataset to 1
        # and write a single giant file. Fail loud; remote layouts need a
        # FileSystem-API sizing pass instead.
        raise ValueError(
            f"compact_layout: no local parquet bytes found under {path!r} "
            "(remote URI or empty directory?)"
        )
    n_out = max(1, -(-total // target_bytes))  # ceil
    df = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(out_path)
    return n_out
