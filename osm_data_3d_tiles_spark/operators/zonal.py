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


def overlay_area_join(rects: DataFrame, zones: DataFrame) -> DataFrame:
    """Polygon-overlay area join for axis-aligned footprints: every
    (building, zone) pair with positive intersection, plus the exact
    intersection area in scaled integer cents.

    rects(osm_id, x0, y0, x1, y1) × zones(zone_id, zx0, zy0, zx1, zy1) →
    (osm_id, zone_id, overlap_area_c).

    Plan shape: zones are a dimension (admin boundaries, grid cells) —
    broadcast them and let the clipped-extent predicate run inside the
    broadcast join; the big fact side is never shuffled. Arbitrary-polygon
    overlays ride the same plan with the clip kernel swapped in
    (Sutherland–Hodgman in an Arrow stage); the rect case keeps the whole
    computation JVM-side in whole-stage codegen.
    """
    ow = F.least(F.col("x1"), F.col("zx1")) - F.greatest(F.col("x0"), F.col("zx0"))
    oh = F.least(F.col("y1"), F.col("zy1")) - F.greatest(F.col("y0"), F.col("zy0"))
    return (
        rects.join(
            F.broadcast(zones),
            (F.col("x0") < F.col("zx1"))
            & (F.col("x1") > F.col("zx0"))
            & (F.col("y0") < F.col("zy1"))
            & (F.col("y1") > F.col("zy0")),
        )
        .select(
            "osm_id",
            "zone_id",
            F.floor(ow * oh * 100 + F.lit(0.5)).cast("long").alias("overlap_area_c"),
        )
    )
