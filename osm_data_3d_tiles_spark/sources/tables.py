"""Catalog-aware input tables — the engine's front door for the 10¹²-document
web-pages input.

The production deployment reads an Iceberg TABLE (`catalog.db.pages`) so scans
get partition pruning, column pruning, and snapshot isolation from the table
format; the sandbox (no Iceberg runtime jars) reads the same schema from
parquet paths. `read_table` routes on the reference shape and keeps the
Iceberg-only knobs (time travel) explicit:

- ``"catalog.db.pages"`` (dotted, no path separator) → ``spark.read.table``,
  with Iceberg's public read options when requested: ``snapshot-id`` /
  ``as-of-timestamp`` time travel — this is what Iceberg-snapshot
  checkpoint/resume pins (plans/pipeline.run_with_checkpoints is the
  file-based equivalent the sandbox exercises).
- a path (contains ``/`` or ends in ``.parquet``) → ``spark.read.parquet``.

Either way the result is a plain DataFrame: every operator downstream is
format-agnostic, and Catalyst pushes filters/projections into whichever
scan this resolves to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# the north-rule input shape: Common-Crawl-style web pages
PAGES_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def read_table(
    spark: SparkSession,
    ref: str,
    snapshot_id: int | None = None,
    as_of_timestamp_ms: int | None = None,
) -> DataFrame:
    """DataFrame for a table reference: dotted catalog name or parquet path.

    ``snapshot_id`` / ``as_of_timestamp_ms`` are Iceberg time-travel pins and
    require a catalog table; asking for them on a parquet path raises instead
    of silently reading the latest data."""
    is_path = "/" in ref or ref.endswith(".parquet")
    if is_path:
        if snapshot_id is not None or as_of_timestamp_ms is not None:
            raise ValueError(
                "time travel (snapshot_id / as_of_timestamp_ms) needs an "
                f"Iceberg catalog table, not a parquet path: {ref!r}"
            )
        return spark.read.parquet(ref)
    reader = spark.read
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    if as_of_timestamp_ms is not None:
        reader = reader.option("as-of-timestamp", str(as_of_timestamp_ms))
    return reader.table(ref)


def read_pages(
    spark: SparkSession,
    ref: str,
    columns: tuple[str, ...] | None = None,
    **time_travel,
) -> DataFrame:
    """The pages input with its contract enforced: (url, warc_ts, html, text,
    lang) must all exist; `columns` prunes the scan (column pruning reaches the
    parquet/Iceberg reader — never scan html bytes for a text-only query)."""
    df = read_table(spark, ref, **time_travel)
    missing = [c for c in PAGES_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"pages table {ref!r} is missing required columns {missing}; "
            f"expected at least {PAGES_COLUMNS}"
        )
    return df.select(*columns) if columns else df
