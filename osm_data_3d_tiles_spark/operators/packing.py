"""Sequence packing — concat-and-chop token-stream layout for pretraining.

GPT-style pretraining consumes fixed-length token sequences built by
concatenating documents in a deterministic order and chopping the stream at
`max_tokens` boundaries (documents may straddle a boundary).  The planner's
job is the *layout*: for every document, which sequence(s) it lands in and
at what offsets.  That is a pure function of the global exclusive prefix sum
of token counts in document order.

Scale shape (100 TB): a naive `SUM() OVER (ORDER BY doc_id)` window has no
partition key, so Spark would sort the whole corpus into ONE partition — the
classic global-cumsum bottleneck.  This operator runs the textbook
two-phase distributed prefix sum instead:

1. coarse blocks: `block = doc_id >> block_bits`; per-block token subtotals
   are one small aggregate (|blocks| rows ≈ |docs| / 2^block_bits);
2. exclusive *block* offsets via a window over that tiny aggregate (the only
   single-partition sort, over |blocks| rows, never over rows);
3. exclusive *row* offsets via a window PARTITIONED BY block — every block's
   cumsum runs in parallel — plus the broadcast-joined block offset.

The result is bit-identical to the single-window formulation (the SQL oracle
states exactly that), with the wide work spread across blocks.  Documents
spanning k > 1 sequences emit k rows via a bounded `sequence`+`explode`
(k ≤ n_tok / max_tokens + 2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_token_stream(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tok: Column | None = None,
    block_bits: int = 12,
) -> DataFrame:
    """Assign documents to fixed-length packed sequences, in `id_col` order.

    Output: one row per (document, sequence) span —
    (seq_id, doc_id, doc_off, seq_off, len): tokens
    [doc_off, doc_off+len) of the document occupy positions
    [seq_off, seq_off+len) of sequence seq_id.  Whitespace token counts by
    default; pass `n_tok` (a Column over `docs`) to plug a real tokenizer's
    counts.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    toks = (
        F.size(F.split(F.col(text_col), " ", -1)) if n_tok is None else n_tok
    ).cast("long")
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), toks.alias("n_tok")
    ).withColumn("block", F.shiftright("doc_id", block_bits))

    btot = d.groupBy("block").agg(F.sum("n_tok").alias("btok"))
    w_blk = Window.orderBy("block").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "block", F.coalesce(F.sum("btok").over(w_blk), F.lit(0)).alias("block_off")
    )

    w_row = (
        Window.partitionBy("block")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    started = (
        d.join(F.broadcast(boff), "block")
        .withColumn(
            "start",
            F.col("block_off") + F.coalesce(F.sum("n_tok").over(w_row), F.lit(0)),
        )
        .where(F.col("n_tok") > 0)
    )

    m = F.lit(int(max_tokens)).cast("long")
    seg_lo = F.greatest(F.col("start"), F.col("seq_id") * m)
    seg_hi = F.least(F.col("start") + F.col("n_tok"), (F.col("seq_id") + 1) * m)
    return (
        started.select(
            "doc_id",
            "n_tok",
            "start",
            F.explode(
                F.sequence(
                    F.floor(F.col("start") / m),
                    F.floor((F.col("start") + F.col("n_tok") - 1) / m),
                )
            ).alias("seq_id"),
        )
        .select(
            F.col("seq_id").cast("long").alias("seq_id"),
            "doc_id",
            (seg_lo - F.col("start")).cast("long").alias("doc_off"),
            (seg_lo - F.col("seq_id") * m).cast("long").alias("seq_off"),
            (seg_hi - seg_lo).cast("long").alias("len"),
        )
    )
