"""Bottom-k containment (quote / near-superset detection): the planted
quote family must be flagged as contained in its source with containment
~1 even though its Jaccard vs the source is low — the asymmetric case the
symmetric MinHash-LSH pipeline cannot express."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.dedup import (
    CONT_THRESHOLD_PPM,
    QUOTE_IDS,
    QUOTE_OFFSET,
    QUOTE_TOKENS,
    _containment_corpus,
    dedup_minhash_containment,
)
from cdc_postgresql_clickhouse_spark.functions.text import tokens, word_shingles


def test_planted_quotes_detected_with_low_jaccard(spark, sf_dir):
    out = dedup_minhash_containment(spark, sf_dir).cache()
    rows = {(r.doc_sub, r.doc_sup): r for r in out.collect()}
    assert rows
    # every planted quote must be found contained in its source document
    found = {
        (sub, sup) for (sub, sup) in rows
        if sub >= QUOTE_OFFSET and sup == sub - QUOTE_OFFSET
    }
    expected = {(i + QUOTE_OFFSET, i) for i in range(QUOTE_IDS)}
    assert expected <= found, expected - found
    for pair in expected:
        assert rows[pair].containment_ppm >= CONT_THRESHOLD_PPM
    # and the relationship is genuinely asymmetric: a LONG source cannot be
    # contained in its own quote (with >= CONT_K + 2 tokens the sample has
    # m = CONT_K shingles but at most QUOTE_TOKENS - 2 can hit the quote,
    # capping reverse containment at (q-2)/k = 0.5625 < threshold). Short
    # sources (~quote-sized) are legitimately contained in their quotes.
    from cdc_postgresql_clickhouse_spark.queries.dedup import CONT_K
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    long_ids = {
        r.doc_id
        for r in docs.filter(F.col("doc_id") < QUOTE_IDS)
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .filter(F.col("n") >= CONT_K + 2)
        .collect()
    }
    assert long_ids  # fixture sanity: some sources are long
    assert not any(
        sub in long_ids and sup == sub + QUOTE_OFFSET for (sub, sup) in rows
    )


def test_quote_jaccard_is_low_but_containment_high(spark, sf_dir):
    """Direct pin of WHY this operator exists: for a planted quote pair the
    exact shingle Jaccard is below the 0.5 LSH verify threshold while exact
    containment is ~1."""
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    corpus = _containment_corpus(spark, sf_dir)
    # pick a source long enough (>= 2x quote length) that Jaccard must be low
    docs = load_table(spark, sf_dir, "documents")
    pick = (
        docs.filter(F.col("doc_id") < QUOTE_IDS)
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .filter(F.col("n") >= 2 * QUOTE_TOKENS)
        .orderBy("doc_id")
        .first()
        .doc_id
    )
    shs = corpus.filter(F.col("doc_id").isin(pick, pick + QUOTE_OFFSET)).select(
        "doc_id", F.array_distinct(word_shingles(tokens(F.col("text")), 3)).alias("shs")
    )
    by = {r.doc_id: set(r.shs) for r in shs.collect()}
    a, b = by[pick + QUOTE_OFFSET], by[pick]
    inter = len(a & b)
    assert inter / len(a) > 0.9                 # containment of quote in doc
    assert inter / len(a | b) < 0.5             # Jaccard under LSH threshold
    assert len(a) == QUOTE_TOKENS - 2           # quote has exactly q-2 shingles
