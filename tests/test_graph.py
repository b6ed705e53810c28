"""Fixed-point PageRank."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_data_3d_tiles_spark.operators.graph import pagerank


def _nodes(spark, n):
    return spark.range(n).select(F.col("id").alias("node"))


class TestPagerank:
    def test_ring_is_uniform(self, spark):
        # i -> (i+1) % n: perfectly symmetric, no dangling -> every rank equal
        n = 16
        edges = spark.range(n).select(
            F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
        )
        out = pagerank(edges, _nodes(spark, n), n_iter=5).toPandas()
        assert out.rank_fp.nunique() == 1
        # mass conserved up to integer truncation (< 1 unit per node per round)
        assert abs(out.rank_fp.sum() - 10**12) < 6 * n

    def test_star_hub_dominates(self, spark):
        # every spoke points at node 0; node 0 points at node 1
        n = 10
        spokes = spark.range(1, n).select(F.col("id").alias("src"), F.lit(0).alias("dst"))
        edges = spokes.unionByName(
            spark.createDataFrame([(0, 1)], ["src", "dst"])
        )
        out = pagerank(edges, _nodes(spark, n), n_iter=5).toPandas().set_index("node")
        assert out.rank_fp.idxmax() == 0
        assert out.loc[1, "rank_fp"] > out.loc[2, "rank_fp"]  # 1 inherits hub mass
        assert out.loc[2, "rank_fp"] == out.loc[9, "rank_fp"]  # leaves symmetric

    def test_matches_float_reference(self, spark):
        """The integer truncation must stay within ~edges micro-units of the
        float power iteration with identical semantics (dangling mass
        removed, no renormalization)."""
        rng = np.random.default_rng(11)
        n, m = 50, 200
        e = rng.integers(0, n, size=(m, 2))
        edges = spark.createDataFrame([(int(a), int(b)) for a, b in e], ["src", "dst"])
        got = (
            pagerank(edges, _nodes(spark, n), n_iter=5)
            .toPandas()
            .sort_values("node")
            .rank_fp.to_numpy()
        )
        od = np.bincount(e[:, 0], minlength=n)
        r = np.full(n, 1.0 / n)
        for _ in range(5):
            nxt = np.full(n, 0.15 / n)
            for a, b in e:
                nxt[b] += 0.85 * r[a] / od[a]
            r = nxt
        np.testing.assert_allclose(got / 1e12, r, atol=(m + n) * 5e-12)

    def test_validation(self, spark):
        edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
        with pytest.raises(ValueError, match="n_iter"):
            pagerank(edges, _nodes(spark, 2), n_iter=0)
        with pytest.raises(ValueError, match="damping"):
            pagerank(edges, _nodes(spark, 2), damping=(20, 17))
