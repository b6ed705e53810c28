"""The engine's SQL front door: table views + kernel functions registered
into a SparkSession so pure-SQL users get the whole surface.

The north-rule API is "pyspark.sql DataFrame + vectorized pandas/Arrow
UDFs"; many downstream consumers (BI, ad-hoc analysis, the oracle harness
itself) speak SQL strings instead of DataFrames. `register_sql_api` makes
`spark.sql(...)` a first-class way to drive the engine:

- every testdata table becomes a temp view (`documents`, `events`, …);
- the Arrow kernels register as SQL functions (`lang_id`, `token_count`,
  `fingerprint` — vectorized pandas UDFs, not per-row Python);
- the pure-SQL fragments (haversine, morton, Liang–Barsky) need no
  registration at all: they are plain expressions (see functions/geodesic,
  functions/morton, operators/zonal) and work in any dialect.

The CLI exposes this as `sql --query/--file` for spark-submit use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Temp view per parquet table under `sf_dir` (missing tables skipped —
    a pages-only deployment has no TPC-H dims). Probes by ATTEMPTING the
    read, not os.path.exists, so remote URIs (s3a://, hdfs://) register
    exactly like local paths. Returns registered names."""
    from pyspark.errors import AnalysisException

    done = []
    for t in TABLES:
        path = f"{sf_dir.rstrip('/')}/{t}.parquet"
        try:
            spark.read.parquet(path).createOrReplaceTempView(t)
        except AnalysisException:
            continue
        done.append(t)
    return done


def register_functions(spark: SparkSession) -> list[str]:
    """Register the engine's vectorized text kernels as SQL functions."""
    from .operators.textops import fingerprint_udf, lang_id_udf, token_count_udf

    spark.udf.register("lang_id", lang_id_udf)
    spark.udf.register("token_count", token_count_udf)
    spark.udf.register("fingerprint", fingerprint_udf)
    return ["lang_id", "token_count", "fingerprint"]


def register_sql_api(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Everything at once: kernel functions, plus table views when a data
    directory is given."""
    register_functions(spark)
    if sf_dir:
        register_views(spark, sf_dir)


def run_sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """One-call SQL execution against a registered session."""
    register_sql_api(spark, sf_dir)
    return spark.sql(query)
