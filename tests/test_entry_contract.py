"""Replicates the driver's correctness gate locally at sf0.001: run every
queries() entry through Spark AND its oracle_sql() through DuckDB on the same
parquet, compare row count + sorted-column value multiset."""

import importlib.util
import os

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.001"

spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and df[c].map(lambda v: isinstance(v, (list, tuple))).any():
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        try:
            import numpy as np

            if df[c].map(lambda v: isinstance(v, np.ndarray)).any():
                df[c] = df[c].map(lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else v)
        except Exception:
            pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    out = entry_mod.entry(spark)
    assert out.count() > 0
    assert set(out.columns) == {"url", "osm_id", "tile_key"}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, duck, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    want = duck.execute(ORACLES[name]).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        # dtype parity approximates the driver's value-hash gate: DuckDB
        # HUGEINT/DOUBLE outputs land in pandas as float64/object where Spark
        # gives int64, and hash(123.0) != hash(123) there even though == holds.
        # kind (not exact width): int32-vs-int64 survives the driver's hash,
        # float64-vs-int64 does not.
        assert g[c].dtype.kind == w[c].dtype.kind, (
            f"{name}.{c}: dtype {g[c].dtype} != oracle {w[c].dtype} "
            "(add an explicit CAST in the oracle SQL)"
        )
        gv, wv = g[c].tolist(), w[c].tolist()
        assert gv == wv, f"{name}.{c}: first diff at " + str(
            next((i, a, b) for i, (a, b) in enumerate(zip(gv, wv)) if a != b)
        )


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES) - {"flagship_pages_pipeline"})
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
