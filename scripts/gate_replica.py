"""One-off replica of the external correctness driver at an arbitrary sf.

Runs each queries() entry through Spark AND its oracle_sql() through DuckDB on
the same parquet tables, compares row count, sorted schema, and the sorted
value multiset — the same three checks the driver records per query.

Usage: python scripts/gate_replica.py [sf_dir] [n_queries]
       defaults: /root/testdata/sf0.01, first 50 (the driver window)
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and df[c].map(lambda v: isinstance(v, (list, tuple))).any():
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        if df[c].map(lambda v: isinstance(v, np.ndarray)).any():
            df[c] = df[c].map(lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else v)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if len(a) != len(b) or list(a.columns) != list(b.columns):
        return False
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        try:
            fa = av.astype(np.float64)
            fb = bv.astype(np.float64)
            if not np.allclose(fa, fb, rtol=1e-9, atol=1e-9, equal_nan=True):
                return False
        except (TypeError, ValueError):
            if not (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all():
                return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py"))
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = list(queries)[:n_q]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("gate-replica")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    results: dict[str, dict] = {}
    n_bad = 0
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            got = normalize(queries[name](spark, sf_dir).toPandas())
            if name in oracles:
                want = normalize(con.execute(oracles[name]).fetchdf())
                rows = len(got) == len(want)
                schema = list(got.columns) == list(want.columns)
                vals = values_match(got, want)
            else:
                rows = schema = vals = len(got) >= 0
            ok = rows and schema and vals
            results[name] = {"rows": rows, "schema": schema, "values": vals,
                             "n": len(got), "secs": round(time.time() - t0, 2)}
        except Exception as exc:  # noqa: BLE001 — gate must report, not crash
            ok = False
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:300],
                             "secs": round(time.time() - t0, 2)}
        n_bad += 0 if ok else 1
        print(f"[{i + 1}/{len(names)}] {name}: "
              f"{'OK' if ok else 'FAIL ' + json.dumps(results[name])} "
              f"({results[name]['secs']}s)", flush=True)

    print(json.dumps({"sf_dir": sf_dir, "checked": len(names), "failed": n_bad}))
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
