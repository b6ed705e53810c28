"""Spark-level tests for build_tiles_3d: fixture pipeline integration, buffer
invariants, and partition-count independence (N vs 4N determinism — the sandbox
evidence for the north rule's identical-output-at-two-cluster-sizes criterion)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_data_3d_tiles_spark.functions.params import with_building_params
from osm_data_3d_tiles_spark.operators.build3d import build_tiles_3d
from osm_data_3d_tiles_spark.operators.cells import building_cells
from osm_data_3d_tiles_spark.operators.ownership import owner_tiles
from osm_data_3d_tiles_spark.sources import fixtures as fx


@pytest.fixture(scope="module")
def assigned_buildings(spark):
    blds = fx.load_fixture(spark, "buildings", 0.001).filter(F.col("layer") == "buildings")
    owners = owner_tiles(building_cells(blds)).select("osm_id", "tile_key", "tile_x", "tile_y")
    return with_building_params(blds).join(owners, "osm_id")


@pytest.fixture(scope="module")
def tiles_pdf(assigned_buildings):
    return build_tiles_3d(assigned_buildings).toPandas()


class TestBuildTiles3D:
    def test_every_building_in_exactly_one_tile(self, assigned_buildings, tiles_pdf):
        n_buildings = assigned_buildings.count()
        assert int(tiles_pdf["batch_length"].sum()) == n_buildings
        all_ids = np.concatenate(tiles_pdf["osm_ids"].to_numpy())
        assert len(all_ids) == len(set(all_ids)) == n_buildings

    def test_buffer_shapes(self, tiles_pdf):
        for _, row in tiles_pdf.iterrows():
            n = row["n_vertices"]
            assert len(row["position"]) == 3 * n
            assert len(row["normal"]) == 3 * n
            assert len(row["uv"]) == 2 * n
            assert len(row["batch_id"]) == n
            assert len(row["texture_id"]) == n
            assert len(row["color"]) == 3 * n
            assert n % 3 == 0  # non-indexed triangles
            # batch ids dense 0..batch_length-1 and ascending (merge order)
            bids = np.asarray(row["batch_id"])
            assert bids.min() == 0 and bids.max() == row["batch_length"] - 1
            assert np.all(np.diff(bids) >= 0)

    def test_normals_unit(self, tiles_pdf):
        row = tiles_pdf.iloc[0]
        n = np.asarray(row["normal"], dtype=np.float64).reshape(-1, 3)
        norms = np.linalg.norm(n, axis=1)
        # unit normals, except degenerate triangles (zero-width wall segments at
        # integer-U cuts — the reference emits those too; walls-builder.ts:246-253
        # duplicates the first cut when u0 is an integer) where three.js's
        # computeVertexNormals also leaves the zero vector
        nonzero = norms > 0
        assert nonzero.any()
        assert np.allclose(norms[nonzero], 1.0, atol=1e-3)

    def test_bbox_contains_positions(self, tiles_pdf):
        for _, row in tiles_pdf.head(5).iterrows():
            p = np.asarray(row["position"], dtype=np.float64).reshape(-1, 3)
            bb = np.asarray(row["bbox"])
            assert np.all(p.min(axis=0) >= bb[:3] - 1e-3)
            assert np.all(p.max(axis=0) <= bb[3:] + 1e-3)

    def test_positions_tile_local(self, tiles_pdf):
        from osm_data_3d_tiles_spark.functions import mercator as m

        span = m.tile_span(16)
        for _, row in tiles_pdf.head(5).iterrows():
            p = np.asarray(row["position"], dtype=np.float64).reshape(-1, 3)
            # tile-local coords: within a few tile spans of the tile origin
            # (buildings can straddle; onion roofs bulge slightly outside)
            assert np.abs(p[:, :2]).max() < 4 * span

    def test_partition_count_independence(self, spark, assigned_buildings):
        """Same output at 2 and 16 input partitions — the determinism invariant
        that makes the N vs 4N scaling runs byte-comparable."""
        out_small = (
            build_tiles_3d(assigned_buildings.repartition(2))
            .select("tile_key", "batch_length", "n_vertices")
            .toPandas()
            .sort_values("tile_key")
            .reset_index(drop=True)
        )
        out_large = (
            build_tiles_3d(assigned_buildings.repartition(16))
            .select("tile_key", "batch_length", "n_vertices")
            .toPandas()
            .sort_values("tile_key")
            .reset_index(drop=True)
        )
        assert out_small.equals(out_large)

    def test_single_exchange_plan(self, assigned_buildings):
        """The construction stage adds exactly one shuffle (hash on tile_key)."""
        df = build_tiles_3d(assigned_buildings)
        plan = df._jdf.queryExecution().toString()
        assert "FlatMapGroupsInPandas" in plan
        # the construction stage shuffles once, hash-partitioned on tile_key
        assert "hashpartitioning(tile_key" in plan
