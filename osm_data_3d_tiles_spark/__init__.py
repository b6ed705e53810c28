"""osm_data_3d_tiles_spark — a from-scratch PySpark-native spatial-join + 3D-tiling engine.

Re-expresses the capabilities of the reference engine (TANK2003/osm-data-3d-tiles,
a Node.js/TypeScript on-demand B3DM tile server) as an idiomatic Spark pipeline:

- geometry kernels as vectorized numpy inside Arrow pandas UDFs (never per-row Python),
- the relational spine (cell explode, broadcast cell-prefiltered point-in-polygon join,
  first-claimer tile ownership, per-tile batch tables) as native DataFrame operators,
- tileset.json assembly driver-side from small aggregates,
- web-scale text ops (dedup, similarity search, language id, quality scoring) as
  first-class operators over Common-Crawl-style page tables.

Scale design: the engine assumes a 1000-executor cluster over ~100 TB of pages.
Buildings (dimension side) are broadcast; pages (fact side) stream through narrow
stages with filters/pruning pushed to the parquet scan; all shuffles are keyed on
cell/tile ids sized by `spark.sql.shuffle.partitions`; skew from hot cells is handled
with salting + AQE.
"""

__version__ = "0.1.0"
