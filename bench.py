"""Bench harness — prints ONE JSON line.

Measures:
- flagship spatial-join + tile-assignment throughput (docs/sec) at
  local[$SPARK_GRAFT_CPUS] over the deterministic fixture pages/buildings scaled by
  $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1 → sf 0.1 → 200k pages),
- per-query wall seconds for the headline operator queries from __spark_entry__,
- scaling evidence for the north rule: the same flagship job at N and 4N local
  cores (default 8 vs 32), reporting throughput at both and efficiency
  = (throughput_4N / throughput_N) / 4.

Usage: python bench.py            (full: headline queries + scaling runs)
       python bench.py --fast     (flagship + queries at full cores only)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", str(max(1, CPUS // 4))))

HEADLINE = [
    "pip_join_docs_rects",
    "tile_ownership",
    "batch_table_pivot",
    "knn_topk",
    "zonal_stats_rects",
    "height_params",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_topk",
    "lang_id",
    "agg_pricing_summary",
    "events_tumbling_counts",
]


def sf_of(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[1])
    except Exception:
        return 0.1


def make_session(cores: int):
    from osm_data_3d_tiles_spark.session import get_spark

    return get_spark(
        app_name=f"bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(8, cores),
    )


def run_flagship(spark, sf: float) -> tuple[float, int, int]:
    """Returns (seconds, docs_processed, join_rows)."""
    from pyspark.sql import functions as F

    from osm_data_3d_tiles_spark.plans.pipeline import flagship
    from osm_data_3d_tiles_spark.sources import fixtures as fx

    pages = fx.load_fixture(spark, "pages", sf)
    buildings = fx.load_fixture(spark, "buildings", sf)
    n_docs = pages.count()

    t0 = time.perf_counter()
    out = flagship(pages, buildings)
    joined = out["join_rows"].join(out["tile_assignment"], "osm_id")
    n_rows = joined.count()
    secs = time.perf_counter() - t0
    return secs, n_docs, n_rows


def main() -> None:
    fast = "--fast" in sys.argv
    sf = sf_of(SF_DIR)

    # pre-generate fixtures outside the timed window
    from osm_data_3d_tiles_spark.sources import fixtures as fx

    fx.ensure_fixture("pages", sf)
    fx.ensure_fixture("buildings", sf)

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    result: dict = {"sf": sf, "unit": "sec", "queries": {}}

    spark = make_session(CPUS)
    try:
        # warm-up: JVM + python workers (excluded from timings)
        spark.range(1000).selectExpr("sum(id)").collect()

        secs, n_docs, n_rows = run_flagship(spark, sf)
        result["metric"] = "spatial_join_tile_assignment_docs_per_sec"
        result["value"] = round(n_docs / secs, 2)
        result["flagship_secs"] = round(secs, 3)
        result["flagship_docs"] = n_docs
        result["flagship_join_rows"] = n_rows

        for name in HEADLINE:
            if name not in queries:
                continue
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            result["queries"][name] = round(time.perf_counter() - t0, 3)
    finally:
        spark.stop()

    if not fast:
        scaling = {}
        for cores, key in ((SCALE_N, "n"), (CPUS, "4n")):
            s = make_session(cores)
            try:
                s.range(1000).selectExpr("sum(id)").collect()
                secs, n_docs, _ = run_flagship(s, sf)
                scaling[key] = {
                    "cores": cores,
                    "secs": round(secs, 3),
                    "docs_per_sec": round(n_docs / secs, 2),
                }
            finally:
                s.stop()
        ratio = scaling["4n"]["docs_per_sec"] / scaling["n"]["docs_per_sec"]
        scaling["speedup"] = round(ratio, 3)
        scaling["core_ratio"] = CPUS / SCALE_N
        scaling["efficiency"] = round(ratio / (CPUS / SCALE_N), 3)
        result["scaling"] = scaling

    print(json.dumps(result))


if __name__ == "__main__":
    main()
