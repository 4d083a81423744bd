"""Sequence-packing invariants (operators/training.py pack_sequences):
exact chunk fill, lossless document reconstruction, contiguity, and
partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.operators.training import pack_sequences

SF = "/root/testdata/sf0.001"
L = 64


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_chunks_full_except_last(spark):
    pieces = pack_sequences(_docs(spark), L)
    fill = (
        pieces.groupBy("lang", "chunk_id")
        .agg(F.sum("piece_len").alias("fill"), F.max("chunk_id").alias("c"))
        .collect()
    )
    last = {}
    for r in fill:
        last[r.lang] = max(last.get(r.lang, -1), r.chunk_id)
    for r in fill:
        if r.chunk_id < last[r.lang]:
            assert r.fill == L, (r.lang, r.chunk_id, r.fill)
        else:
            assert 0 < r.fill <= L


def test_docs_reconstruct_losslessly(spark):
    docs = _docs(spark)
    pieces = pack_sequences(docs, L)
    got = {
        r.doc_id: (r.total, r.n_pieces, r.starts)
        for r in pieces.groupBy("doc_id")
        .agg(
            F.sum("piece_len").alias("total"),
            F.count("*").alias("n_pieces"),
            F.array_sort(
                F.collect_list(F.struct("piece_start", "piece_len"))
            ).alias("starts"),
        )
        .collect()
    }
    want = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    assert set(got) == set(want)
    for doc_id, (total, _n, starts) in got.items():
        assert total == want[doc_id]
        # pieces tile the doc contiguously from 0
        pos = 0
        for s in starts:
            assert s.piece_start == pos
            pos += s.piece_len
        assert pos == want[doc_id]


def test_chunk_positions_tile_each_chunk(spark):
    pieces = pack_sequences(_docs(spark), L)
    rows = (
        pieces.groupBy("lang", "chunk_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_pos", "piece_len"))
            ).alias("ps")
        )
        .collect()
    )
    for r in rows:
        pos = 0
        for s in r.ps:
            assert s.chunk_pos == pos, (r.lang, r.chunk_id)
            pos += s.piece_len


def test_partition_invariance(spark):
    docs = _docs(spark)
    a = pack_sequences(docs, L).collect()
    b = pack_sequences(docs.repartition(7, "doc_id"), L).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    assert key(a) == key(b)
