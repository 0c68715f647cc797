"""Strided-chunking invariants: full coverage of the token stream, exact
stride overlap between consecutive chunks, and short-tail handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.functions.text import tokens
from cdc_postgresql_clickhouse_spark.queries.chunking import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    _CHUNKS,
)


def _chunks_of(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    rows = (
        df.select(tokens(F.col("text")).alias("toks"))
        .select(F.posexplode(F.expr(_CHUNKS)).alias("idx", "c"))
        .select("idx", "c.start", "c.piece")
        .collect()
    )
    return [(r.idx, r.start, r.piece) for r in rows]


def test_chunks_cover_and_overlap(spark):
    n = 200
    text = " ".join(f"w{i}" for i in range(n))
    chunks = _chunks_of(spark, text)
    # starts advance by exactly the stride; indices are dense from 0
    assert [c[0] for c in chunks] == list(range(len(chunks)))
    assert [c[1] for c in chunks] == list(range(1, n + 1, CHUNK_STRIDE))
    # every token appears in at least one chunk (coverage)
    covered = {tok for _, _, piece in chunks for tok in piece}
    assert covered == {f"w{i}" for i in range(n)}
    # consecutive full chunks share exactly CHUNK_TOKENS - CHUNK_STRIDE tokens
    for (_, s1, p1), (_, s2, p2) in zip(chunks, chunks[1:]):
        if len(p1) == CHUNK_TOKENS:
            assert p1[CHUNK_STRIDE:] == p2[: CHUNK_TOKENS - CHUNK_STRIDE]


def test_short_doc_single_chunk(spark):
    chunks = _chunks_of(spark, "alpha beta gamma")
    assert len(chunks) == 1
    assert chunks[0][2] == ["alpha", "beta", "gamma"]


def test_empty_doc_no_chunks(spark):
    assert _chunks_of(spark, "") == []
    assert _chunks_of(spark, "!!! ???") == []  # normalizes to no tokens


def test_content_defined_chunks_survive_edits(spark, sf_dir):
    """The reason content-defined chunking exists: the derived near-dup docs
    (first token dropped) share almost all their chunks with their base under
    content-defined boundaries, and ZERO under fixed-stride boundaries."""
    from cdc_postgresql_clickhouse_spark.queries import all_queries
    from cdc_postgresql_clickhouse_spark.queries.dedup import _corpus

    from cdc_postgresql_clickhouse_spark.queries.chunking import _BPOS, _CDC_PIECES
    from cdc_postgresql_clickhouse_spark.queries.dedup import DERIVED_OFFSET

    assert all_queries()["chunk_dedup_content_defined"](spark, sf_dir).count() > 0

    # compare base <-> ITS OWN derived copy only: the fixture contains exact
    # duplicate documents, which share chunks under ANY scheme — but a doc
    # and its first-token-dropped twin can only share chunks if boundaries
    # re-align after the edit
    corpus = _corpus(spark, sf_dir)
    base = corpus.select("doc_id", tokens(F.col("text")).alias("toks"))

    def own_pair_matches(chunks):
        a = chunks.alias("a")
        b = chunks.select(
            (F.col("doc_id") - DERIVED_OFFSET).alias("doc_id"), "chunk_md5"
        ).alias("b")
        return (
            a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                   & (F.col("a.chunk_md5") == F.col("b.chunk_md5")))
            .count()
        )

    cdc_chunks = (
        base.withColumn("bpos", F.expr(_BPOS))
        .select("doc_id", F.explode(F.expr(_CDC_PIECES)).alias("piece"))
        .select("doc_id", F.md5(F.array_join("piece", " ")).alias("chunk_md5"))
    )
    stride_chunks = base.select(
        "doc_id", F.posexplode(F.expr(_CHUNKS)).alias("idx", "c")
    ).select("doc_id", F.md5(F.array_join("c.piece", " ")).alias("chunk_md5"))

    cdc_matches = own_pair_matches(cdc_chunks)
    stride_matches = own_pair_matches(stride_chunks)
    assert stride_matches == 0, f"stride boundaries unexpectedly re-aligned: {stride_matches}"
    assert cdc_matches > 50, f"content-defined boundaries failed to re-align: {cdc_matches}"
