"""BM25 ranking: contract invariants on the fixture plus a hand-computed
mini-corpus check of the scoring formula."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.search import (
    BM25_B,
    BM25_K1,
    BM25_TOPK,
    SEARCH_QUERIES,
    text_bm25_search,
)


def test_bm25_contract(spark, sf_dir):
    out = text_bm25_search(spark, sf_dir).cache()
    per_q = out.groupBy("query").agg(F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx"))
    assert per_q.filter((F.col("n") > BM25_TOPK) | (F.col("mx") != F.col("n"))).count() == 0
    assert set(r.query for r in per_q.collect()) == set(SEARCH_QUERIES)
    for qn, terms in SEARCH_QUERIES.items():
        mx = out.filter(F.col("query") == qn).agg(F.max("terms_matched")).first()[0]
        assert mx <= len(terms)
    # scores strictly ordered within each query (ties broken by doc_id keep
    # row_number distinct but score_micro must be non-increasing)
    rows = out.orderBy("query", "rank").collect()
    for a, b in zip(rows, rows[1:]):
        if a.query == b.query:
            assert a.score_micro >= b.score_micro


def test_bm25_formula_hand_computed():
    # corpus: d1 = "cat dog", d2 = "cat cat cat dog mouse", d3 = "mouse"
    corpus = {1: ["cat", "dog"], 2: ["cat", "cat", "cat", "dog", "mouse"], 3: ["mouse"]}
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n

    def bm25(term, doc):
        tf = corpus[doc].count(term)
        if tf == 0:
            return 0
        df = sum(1 for t in corpus.values() if term in t)
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        dl = len(corpus[doc])
        sat = tf * (BM25_K1 + 1.0) / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
        return math.floor(idf * sat * 1e6)

    # 'cat' favors d2 (higher tf) over d1 despite d2's longer length penalty
    assert bm25("cat", 2) > bm25("cat", 1) > 0
    # rare term 'mouse' outscores common 'cat' at equal tf in the same doc
    assert bm25("mouse", 2) < bm25("mouse", 3)  # shorter doc wins at same tf
