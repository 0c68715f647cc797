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
