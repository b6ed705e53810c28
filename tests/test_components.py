"""Connected components + transitive dedup clustering."""

import pytest
from pyspark.sql import functions as F

from osm_data_3d_tiles_spark.operators.components import (
    cluster_survivors,
    connected_components,
    shared_ngram_pairs,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["a", "b"])
    out = connected_components(df, **kw).toPandas().sort_values("node")
    return dict(zip(out["node"], out["cluster_id"]))


class TestConnectedComponents:
    def test_chain_converges_to_min(self, spark):
        """A 10-deep path graph — the worst case for label propagation — lands
        every node on cluster 0, crossing the checkpoint boundary."""
        edges = [(i, i + 1) for i in range(9)]
        got = _cc(spark, edges, checkpoint_every=3)
        assert got == {i: 0 for i in range(10)}

    def test_disjoint_components_and_ring(self, spark):
        edges = [(1, 2), (2, 3), (3, 1), (10, 11), (20, 21), (21, 22)]
        got = _cc(spark, edges)
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    def test_edge_direction_and_duplicates_irrelevant(self, spark):
        got = _cc(spark, [(5, 2), (2, 5), (5, 2), (7, 5)])
        assert got == {2: 2, 5: 2, 7: 2}

    def test_partition_invariance(self, spark):
        edges = [(i, i + 1) for i in range(0, 40, 2)] + [(i, i + 2) for i in range(0, 30, 3)]
        df = spark.createDataFrame(edges, ["a", "b"])
        one = connected_components(df).toPandas().sort_values("node").reset_index(drop=True)
        two = (
            connected_components(df.repartition(13))
            .toPandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert one.equals(two)

    def test_max_iter_raises_loudly(self, spark):
        edges = [(i, i + 1) for i in range(15)]
        df = spark.createDataFrame(edges, ["a", "b"])
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(df, max_iter=3)

    def test_max_iter_return_partial(self, spark):
        edges = [(i, i + 1) for i in range(15)]
        df = spark.createDataFrame(edges, ["a", "b"])
        out = connected_components(df, max_iter=3, on_max_iter="return")
        assert out.count() == 16  # partial labelling, all nodes present

    def test_self_loops_ignored(self, spark):
        got = _cc(spark, [(3, 3), (3, 4)])
        assert got == {3: 3, 4: 3}


class TestSharedNgramPairs:
    def test_matches_bruteforce(self, spark):
        docs = [
            (0, "the quick brown fox jumps over the dog"),
            (1, "a quick brown fox jumps over me today"),  # shares 'quick brown fox jumps over' w/ 0
            (2, "completely different words in this one here"),
            (3, "words in this one here completely different"),  # shares 'words in this one here' w/ 2
            (4, "the quick brown fox jumps over the dog"),  # identical to 0
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            tuple(r)
            for r in shared_ngram_pairs(df, n=5).select("a", "b").toPandas().values.tolist()
        }

        def grams(t, n=5):
            w = t.split(" ")
            return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

        want = {
            (a, b)
            for a in range(5)
            for b in range(a + 1, 5)
            if grams(docs[a][1]) & grams(docs[b][1])
        }
        assert got == want
        assert (0, 1) in got and (2, 3) in got and (0, 4) in got

    def test_short_docs_produce_no_grams(self, spark):
        df = spark.createDataFrame([(0, "too short"), (1, "too short")], ["doc_id", "text"])
        assert shared_ngram_pairs(df, n=5).count() == 0


class TestClusterSurvivors:
    def test_keeps_min_per_cluster_and_isolates(self, spark):
        docs = spark.range(10).select(F.col("id").alias("doc_id"), F.lit("t").alias("text"))
        # clusters {1,2,3} (transitively: 1-2, 2-3) and {7,8}; rest isolated
        pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], ["a", "b"])
        kept = sorted(
            cluster_survivors(docs, pairs).select("doc_id").toPandas()["doc_id"].tolist()
        )
        assert kept == [0, 1, 4, 5, 6, 7, 9]

    def test_end_to_end_over_shared_grams(self, spark):
        docs = spark.createDataFrame(
            [
                (10, "alpha beta gamma delta epsilon zeta"),
                (11, "alpha beta gamma delta epsilon eta"),  # shares 5-gram with 10
                (12, "unrelated text goes right here now"),
            ],
            ["doc_id", "text"],
        )
        pairs = shared_ngram_pairs(docs, n=5)
        kept = sorted(
            cluster_survivors(docs, pairs).select("doc_id").toPandas()["doc_id"].tolist()
        )
        assert kept == [10, 12]
