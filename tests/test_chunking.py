"""Chunking/packing invariants: full token coverage with the declared
overlap, short-doc and null handling, and the pack-overrun bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from petk_spark.operators.chunking import chunk_documents, pack_sequences


def test_chunks_cover_all_tokens_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, "doc_id", "text", chunk_tokens=10, stride=7).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts 0,7,...,90 → 14 chunks; all full-size except the tail
    assert [r.chunk_id for r in rows] == list(range(14))
    assert all(r.n_tokens == 10 for r in rows)
    # coverage: first chunk starts at w0, last chunk ends at w99
    assert rows[0].chunk_text.startswith("w0 ")
    assert rows[-1].chunk_text.endswith(" w99")
    # overlap = chunk - stride = 3 tokens between consecutive chunks
    assert rows[0].chunk_text.split()[-3:] == rows[1].chunk_text.split()[:3]


def test_short_and_null_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "   ")], "doc_id long, text string"
    )
    rows = chunk_documents(df, "doc_id", "text", chunk_tokens=10, stride=7).collect()
    assert {(r.id, r.chunk_id, r.n_tokens, r.chunk_text) for r in rows} == {
        (1, 0, 3, "a b c")
    }


def test_pack_overrun_bounded_and_deterministic(spark):
    rows = [(i, " ".join(["t"] * (13 + i % 37))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.size(F.split(F.col("text"), " "))
    out = pack_sequences(df, "doc_id", toks, target_tokens=100, n_buckets=8)
    packed = out.groupBy("bucket", "pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx")
    )
    # cumsum binning overruns by at most one item
    bad = packed.filter(F.col("tot") > 100 + F.col("mx")).count()
    assert bad == 0
    assert packed.count() > 8  # boundaries actually crossed
    # pure function of the data: identical on recompute
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, pack_sequences(
        df.repartition(13), "doc_id", toks, target_tokens=100, n_buckets=8
    ).collect()))
    assert a == b
