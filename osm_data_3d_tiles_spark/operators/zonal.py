"""Raster ↔ vector zonal statistics (graft operator; north rule).

Rasterize each polygon footprint to its covering cells with the reference's
triangle-rasterization kernel (src/building/roof/utils.ts:420-476 semantics via
operators.cells), equi-join the cell-valued raster table on (cell_x, cell_y), and
aggregate per polygon — sum / avg / min / max / count as native Spark aggregates.

At scale the raster table is cell-partitioned parquet, so the join prunes to the
polygon extent; the footprint explosion is on the small vector side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cells import building_cells


def zonal_stats(buildings: DataFrame, raster: DataFrame, z: int = 16) -> DataFrame:
    """buildings(osm_id, geometry, ring_types) × raster(cell_x, cell_y, value) →
    (osm_id, cell_count, value_sum, value_avg, value_min, value_max)."""
    cells = building_cells(buildings, z)
    joined = cells.join(
        raster.select(
            F.col("cell_x").alias("tile_x"), F.col("cell_y").alias("tile_y"), "value"
        ),
        ["tile_x", "tile_y"],
    )
    return joined.groupBy("osm_id").agg(
        F.count("*").alias("cell_count"),
        F.sum("value").alias("value_sum"),
        F.avg("value").alias("value_avg"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )
