"""Generate golden oracle tables for the deterministic rows-only contract queries.

The driver hash-checks any query that has an `oracle_sql()` entry. The rows-only
kernels (MVT decode, MinHash/SimHash signatures, IVF, the flagship composition,
…) have no natural ANSI-SQL formulation, but every one of them is DETERMINISTIC:
seeded platform-stable hashing, numpy kernels, fixed fixtures. So their oracle is
a pinned, reviewed output: `SELECT … FROM read_parquet('golden/<name>.parquet')`.

Scale-factor handling: several queries read `{sf_dir}/documents.parquet` (whose
CONTENT differs between sf0.001 and sf0.01 even though both hold 500 rows), so
each golden carries rows for every sf, tagged with `lineitem_n` — the row count
of the sf's lineitem table (6 000 / 60 000 / 600 000), the one selector a DuckDB
oracle can recover from its pre-registered views:

    … WHERE lineitem_n = (SELECT COUNT(*) FROM lineitem)

What a golden oracle does and does not prove: it pins run-to-run determinism and
guards regressions (any plan change that alters rows fails the driver hash); the
SEMANTIC correctness of each kernel rides its pytest evidence (planted-pair
dedup tests, IVF recall gates, MVT round-trip, flagship component oracles).

Usage: python scripts/make_goldens.py            (regenerate all)
       python scripts/make_goldens.py name1 ...  (regenerate selected)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_DIR = os.path.join(REPO, "golden")
# every sf the driver/tests may run at; a golden matches ZERO rows (an oracle
# row-count mismatch, not a crash) for any sf absent here — extend via env and
# regenerate before running the contract at a new scale factor
SF_DIRS = os.environ.get(
    "SPARK_GRAFT_GOLDEN_SF_DIRS",
    "/root/testdata/sf0.001:/root/testdata/sf0.01:/root/testdata/sf0.1",
).split(":")

# every deterministic rows-only query (plans/contract.py build_rows_only_queries)
GOLDEN_QUERIES = [
    "semdedup",
    "bpe_merges",
    "dsir_select",
    "png_decode_stats",
    "quantized_tile_stats",
    "flagship_pages_pipeline",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_ivf_topk",
    "lang_id_ngram",
    "quality_features",
    "multimodal_features",
    "mvt_ingest",
    "build3d_tiles",
    "building_labels",
    "doc_fingerprint",
    "s2_cell_counts",
    "ann_ivf_pq_topk",
    "multimodal_resize",
    "simplify_rings",
    "jpeg_decode_stats",
    "webp_decode_stats",
]


def main() -> None:
    names = sys.argv[1:] or GOLDEN_QUERIES
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries = mod.queries()

    from osm_data_3d_tiles_spark.session import get_spark

    spark = get_spark(app_name="make-goldens", shuffle_partitions=16)
    try:
        for name in names:
            parts = []
            for sf_dir in SF_DIRS:
                n_li = duckdb.sql(
                    f"select count(*) from read_parquet('{sf_dir}/lineitem.parquet')"
                ).fetchone()[0]
                pdf = queries[name](spark, sf_dir).toPandas()
                pdf.insert(0, "lineitem_n", int(n_li))
                parts.append(pdf)
                print(f"{name} @ {sf_dir}: {len(pdf)} rows")
            out = pd.concat(parts, ignore_index=True)
            # stable on-disk order (the driver sorts before hashing anyway)
            out = out.sort_values(list(out.columns)).reset_index(drop=True)
            out.to_parquet(os.path.join(GOLDEN_DIR, f"{name}.parquet"), index=False)
            print(f"wrote golden/{name}.parquet ({len(out)} rows)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
