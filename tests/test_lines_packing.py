"""Chunk-level dedup and sequence packing."""

import pandas as pd
import pytest

from osm_data_3d_tiles_spark.operators.lines import dedup_text_chunks
from osm_data_3d_tiles_spark.operators.packing import pack_token_stream


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestChunkDedup:
    def test_keep_first_across_and_within_docs(self, spark):
        # chunk_words=2: doc 0 repeats "a b" internally; doc 1 is entirely
        # chunks already seen in doc 0 -> empty survivor.
        rows = [
            (0, "a b c d a b"),
            (1, "a b c d"),
            (2, "x y a b"),
        ]
        got = (
            dedup_text_chunks(_docs(spark, rows), chunk_words=2)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.text_dedup.tolist() == ["a b c d", "", "x y"]
        assert got.n_kept.tolist() == [2, 0, 1]
        assert got.n_chunks.tolist() == [3, 2, 2]

    def test_ragged_tail_chunk(self, spark):
        # 5 words at width 2 -> final chunk is the single word "e", distinct
        # from any 2-word chunk.
        rows = [(0, "a b c d e"), (1, "e")]
        got = (
            dedup_text_chunks(_docs(spark, rows), chunk_words=2)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.text_dedup.tolist() == ["a b c d e", ""]

    def test_empty_text_survives_as_row(self, spark):
        rows = [(0, ""), (1, "")]
        got = (
            dedup_text_chunks(_docs(spark, rows), chunk_words=3)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # split("") == [""] -> one empty chunk; doc 0 owns it, doc 1 loses it
        assert len(got) == 2
        assert got.n_kept.tolist() == [1, 0]

    def test_bad_width_raises(self, spark):
        with pytest.raises(ValueError, match="chunk_words"):
            dedup_text_chunks(_docs(spark, [(0, "a")]), chunk_words=0)


def _brute_pack(rows, m):
    """Single-stream reference: concatenate in doc_id order, chop at m."""
    out, off = [], 0
    for doc_id, text in sorted(rows):
        n = len(text.split(" "))
        for seq in range(off // m, (off + n - 1) // m + 1):
            lo, hi = max(off, seq * m), min(off + n, (seq + 1) * m)
            out.append((seq, doc_id, lo - off, lo - seq * m, hi - lo))
        off += n
    return pd.DataFrame(out, columns=["seq_id", "doc_id", "doc_off", "seq_off", "len"])


class TestPacking:
    ROWS = [(i, " ".join(f"w{j}" for j in range((i * 7919) % 23 + 1))) for i in range(200)]

    def _got(self, spark, **kw):
        return (
            pack_token_stream(_docs(spark, self.ROWS), max_tokens=16, **kw)
            .toPandas()
            .sort_values(["seq_id", "doc_id", "doc_off"])
            .reset_index(drop=True)
        )

    def test_matches_single_stream_bruteforce(self, spark):
        got = self._got(spark, block_bits=4)
        want = (
            _brute_pack(self.ROWS, 16)
            .sort_values(["seq_id", "doc_id", "doc_off"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_block_size_invariance(self, spark):
        # the two-phase prefix sum must be bit-identical for ANY block split
        a, b = self._got(spark, block_bits=2), self._got(spark, block_bits=10)
        pd.testing.assert_frame_equal(a, b)

    def test_every_sequence_full_except_last(self, spark):
        got = self._got(spark, block_bits=4)
        fill = got.groupby("seq_id")["len"].sum()
        assert (fill.iloc[:-1] == 16).all()
        assert 0 < fill.iloc[-1] <= 16

    def test_straddling_doc_offsets_chain(self, spark):
        got = self._got(spark, block_bits=4)
        multi = got.groupby("doc_id").filter(lambda g: len(g) > 1)
        for _, g in multi.groupby("doc_id"):
            g = g.sort_values("seq_id")
            # consecutive sequences, contiguous doc offsets, interior spans
            # start at column 0
            assert (g.seq_id.diff().dropna() == 1).all()
            assert (g.doc_off + g["len"]).iloc[:-1].tolist() == g.doc_off.iloc[1:].tolist()
            assert (g.seq_off.iloc[1:] == 0).all()

    def test_bad_max_tokens_raises(self, spark):
        with pytest.raises(ValueError, match="max_tokens"):
            pack_token_stream(_docs(spark, [(0, "a")]), max_tokens=0)
