"""Deduplication operators over document tables — exact and near-dup.

Scale shapes:
- exact: hash-groupBy — one shuffle on the content hash; the winner per group is the
  min id (deterministic).
- MinHash+LSH: signature in one Arrow stage → explode to (band, band_hash) → the
  *bucket join is an equi-join on the band hash* (shuffle keyed on band hash, no
  quadratic blow-up) → exact Jaccard verify per candidate pair.
- SimHash: 64-bit signature → 4×16-bit chunk buckets (any pair within Hamming
  distance 3 shares ≥1 exact chunk) → Hamming verify.
- embedding near-dup: random-hyperplane LSH buckets → exact cosine verify.

All signatures are computed with seeded, platform-stable hashing (FNV/md5-free of
Python's randomized hash), so results are identical across executors and runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as tx


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: (text_hash, keep_id = min id, dup_count)."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def exact_dedup_keep(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The deduplicated document set itself (rows whose id is the group minimum)."""
    keep = exact_dedup(docs, id_col, text_col).select(F.col("keep_id").alias(id_col))
    return docs.join(keep, id_col)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("signature", T.ArrayType(T.LongType())),
        ]
    )

    def _sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [
                tx.minhash_signature(t, num_perm=num_perm, k=shingle_k).tolist()
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "signature": sigs})

    from ..session import with_min_parallelism

    return with_min_parallelism(docs.select(id_col, text_col)).mapInPandas(_sig, schema=schema)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash, verified by exact signature
    Jaccard estimate ≥ threshold. Output: (a, b, est_jaccard) with a < b."""
    sigs = minhash_signatures(docs, id_col, text_col, num_perm)

    band_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("signature", T.ArrayType(T.LongType())),
            T.StructField("band", T.IntegerType()),
            T.StructField("band_hash", T.LongType()),
        ]
    )

    def _bands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sg, bd, bh = [], [], [], []
            for i, sig in zip(pdf[id_col], pdf["signature"]):
                hashes = tx.minhash_bands(np.asarray(sig, dtype=np.int64), bands)
                for b, h in enumerate(hashes):
                    ids.append(i)
                    sg.append(list(sig))
                    bd.append(b)
                    bh.append(h)
            yield pd.DataFrame({id_col: ids, "signature": sg, "band": bd, "band_hash": bh})

    banded = sigs.mapInPandas(_bands, schema=band_schema)

    left = banded.select(
        F.col(id_col).alias("a"), F.col("signature").alias("sig_a"), "band", "band_hash"
    )
    right = banded.select(
        F.col(id_col).alias("b"), F.col("signature").alias("sig_b"), "band", "band_hash"
    )
    cand = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .dropDuplicates(["a", "b"])
    )
    # exact signature agreement ratio (unbiased Jaccard estimate)
    num_perm_lit = F.size("sig_a").cast("double")
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / num_perm_lit
    )
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("a", "b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ max_hamming over 64-bit SimHash.
    Bucketing: 4 chunks of 16 bits — pigeonhole guarantees any pair within distance
    3 collides on at least one chunk."""
    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("simhash", T.LongType())]
    )

    def _sim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "simhash": [tx.simhash(t) for t in pdf[text_col]]}
            )

    from ..session import with_min_parallelism

    sims = with_min_parallelism(docs.select(id_col, text_col)).mapInPandas(_sim, schema=schema)

    chunks = sims.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.chunk", "c.chunk_val")

    left = chunks.select(
        F.col(id_col).alias("a"), F.col("simhash").alias("sim_a"), "chunk", "chunk_val"
    )
    right = chunks.select(
        F.col(id_col).alias("b"), F.col("simhash").alias("sim_b"), "chunk", "chunk_val"
    )
    cand = (
        left.join(right, ["chunk", "chunk_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sim_a", "sim_b")
        .dropDuplicates(["a", "b"])
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verify over LSH candidates)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: candidates from MinHash LSH (loose
    threshold), verified with true Jaccard over shingle sets."""
    cand = minhash_lsh_pairs(docs, id_col, text_col, threshold=0.5)
    texts = docs.select(F.col(id_col), F.col(text_col))
    pairs = (
        cand.join(texts.withColumnsRenamed({id_col: "a", text_col: "text_a"}), "a")
        .join(texts.withColumnsRenamed({id_col: "b", text_col: "text_b"}), "b")
    )

    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )

    def _verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            jac = [
                tx.ngram_jaccard(ta, tb, shingle_k)
                for ta, tb in zip(pdf["text_a"], pdf["text_b"])
            ]
            yield pd.DataFrame({"a": pdf["a"], "b": pdf["b"], "jaccard": jac})

    out = pairs.select("a", "b", "text_a", "text_b").mapInPandas(_verify, schema=schema)
    return out.filter(F.col("jaccard") >= threshold)


def ngram_jaccard_exact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 3,
    threshold_den: int = 5,
) -> DataFrame:
    """EXACT word-n-gram Jaccard pairs via an inverted index — pure relational
    plan, no Python: explode distinct n-grams, equi-join on the gram (the
    candidate generator — only docs sharing ≥1 gram ever meet), count the
    intersection per pair, derive |union| = |A| + |B| - |I|, and filter with an
    INTEGER cross-multiplication (inter·den ≥ union·num ⟺ J ≥ num/den) so the
    predicate is fp-free and engine-identical.

    Output: (a, b, inter, union_sz) with a < b and J ≥ threshold_num/threshold_den.

    Scale: the gram join shuffles on the gram value; at web scale the standard
    refinement is a document-frequency stop list on hot grams + prefix filtering
    (only the rarest ⌈(1-t)|A|⌉+1 grams of each doc need to be indexed) — both
    drop-in filters on the `grams` relation that do not change the exact result.
    """
    words = F.split(F.col(text_col), " ", -1)
    # guard: Spark sequence(1, k) with k < 1 yields a DESCENDING sequence
    grams_arr = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = (
        docs.select(F.col(id_col).alias("id"), F.explode(grams_arr).alias("g"))
        .distinct()
    )
    sizes = grams.groupBy("id").agg(F.count("*").alias("sz"))
    a = grams.withColumnsRenamed({"id": "a"})
    b = grams.withColumnsRenamed({"id": "b"})
    inter = (
        a.join(b, "g")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "a", "sz": "sa"}), "a")
        .join(sizes.withColumnsRenamed({"id": "b", "sz": "sb"}), "b")
        .withColumn("union_sz", F.col("sa") + F.col("sb") - F.col("inter"))
        .filter(F.col("inter") * threshold_den >= F.col("union_sz") * threshold_num)
        .select("a", "b", "inter", "union_sz")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH buckets + exact cosine verification.
    Output: (a, b, cosine) with a < b and cosine ≥ threshold."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("bucket", T.LongType()),
            T.StructField("unit", T.ArrayType(T.DoubleType())),
        ]
    )

    def _bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes: np.ndarray | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if planes is None:
                rng = np.random.RandomState(seed)
                planes = rng.randn(mat.shape[1], n_planes)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = mat / norms
            bits = (unit @ planes > 0).astype(np.int64)
            bucket = bits @ (1 << np.arange(n_planes, dtype=np.int64))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "bucket": bucket, "unit": [u.tolist() for u in unit]}
            )

    from ..session import with_min_parallelism

    bucketed = with_min_parallelism(embeddings.select(id_col, vec_col)).mapInPandas(_bucket, schema=schema)
    left = bucketed.select(F.col(id_col).alias("a"), F.col("unit").alias("ua"), "bucket")
    right = bucketed.select(F.col(id_col).alias("b"), F.col("unit").alias("ub"), "bucket")
    cand = left.join(right, "bucket").filter(F.col("a") < F.col("b"))
    cosine = F.aggregate(
        F.zip_with("ua", "ub", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    return (
        cand.withColumn("cosine", cosine)
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
        .dropDuplicates(["a", "b"])
    )
