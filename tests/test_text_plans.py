"""Scale-shape pins for the round-3 text/corpus operators: the map-only
scores must compile to zero-shuffle scan jobs, and the posting-list queries
must reuse their persisted intermediate instead of re-scanning the corpus."""

from __future__ import annotations

import re

from cdc_postgresql_clickhouse_spark.plans.inspect import formatted_plan
from cdc_postgresql_clickhouse_spark.queries import all_queries

Q = all_queries()


def _exchanges(plan: str) -> int:
    # count physical shuffle nodes in the tree section only (each node also
    # reappears in the details section; tree lines start with a node marker)
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_repetition_is_map_only(spark, sf_dir):
    plan = formatted_plan(Q["text_repetition_ngram"](spark, sf_dir))
    assert _exchanges(plan) == 0, plan


def test_winnowing_is_map_only(spark, sf_dir):
    plan = formatted_plan(Q["text_winnowing_fingerprints"](spark, sf_dir))
    assert _exchanges(plan) == 0, plan


def test_chunking_is_map_only(spark, sf_dir):
    plan = formatted_plan(Q["doc_chunking"](spark, sf_dir))
    assert _exchanges(plan) == 0, plan
    assert "Generate" in plan  # the explode is the only row-multiplying node


def test_tfidf_reuses_posting_cache(spark, sf_dir):
    """tf and df both read the persisted posting list, not fresh corpus
    scans: the plan must reference the in-memory relation at least twice."""
    plan = formatted_plan(Q["corpus_tfidf_top_terms"](spark, sf_dir))
    cache_refs = plan.count("InMemoryTableScan") + plan.count("TableCacheQueryStage")
    assert cache_refs >= 2, plan


def test_unigram_reuses_posting_cache(spark, sf_dir):
    plan = formatted_plan(Q["text_unigram_logprob"](spark, sf_dir))
    cache_refs = plan.count("InMemoryTableScan") + plan.count("TableCacheQueryStage")
    assert cache_refs >= 2, plan


def test_pii_redact_matches_production_patterns(spark, sf_dir):
    """The registered PII operator must match >0 synthesized spans in EVERY
    class with the production email/phone/account patterns (VERDICT r3: the
    old fixture-fitted pattern would redact nothing PII-shaped), stay
    map-only, and redact what it counts (no '@'/acct spans survive)."""
    from pyspark.sql import functions as F

    out = all_queries()["text_pii_redact"](spark, sf_dir)
    agg = out.agg(
        F.sum("n_emails").alias("e"),
        F.sum("n_phones").alias("p"),
        F.sum("n_accounts").alias("a"),
        F.sum(
            (F.col("n_redactions") != F.col("n_emails") + F.col("n_phones") + F.col("n_accounts")).cast("int")
        ).alias("bad_total"),
    ).first()
    assert agg.e > 0 and agg.p > 0 and agg.a > 0, agg
    assert agg.bad_total == 0
    assert "Exchange" not in formatted_plan(out)


def test_topgram_fold_counts_runs_and_ignores_unique_grams(spark):
    """Planted repetition: 'a b a b a b' has bigram 'a b' x3 (best 3x3=9)
    and 'b a' x2 (6); a no-repeat doc scores 0 even though it HAS long
    unique grams (the cnt>=2 restriction — unique-gram char mass is doc
    length, not repetition)."""
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.functions.text import tokens
    from cdc_postgresql_clickhouse_spark.queries.text_ext import _topgram_best

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "one two three four five")], "doc_id long, text string"
    ).select("doc_id", tokens(F.col("text")).alias("t"))
    out = {
        r.doc_id: (r.b2, r.b3)
        for r in df.select(
            "doc_id",
            _topgram_best(F.col("t"), 2).alias("b2"),
            _topgram_best(F.col("t"), 3).alias("b3"),
        ).collect()
    }
    assert out[1] == (9, 10)  # 'a b' 3x len3; 'a b a' 2x len5
    assert out[2] == (0, 0)


def test_topgram_plan_is_shuffle_free(spark, sf_dir):
    """The per-doc statistic must stay a map job: no Exchange in the plan
    (a groupBy(doc, gram) formulation would shuffle the corpus at token
    grain for a per-row answer)."""
    from cdc_postgresql_clickhouse_spark.plans.inspect import formatted_plan
    from cdc_postgresql_clickhouse_spark.queries.text_ext import QUERIES

    plan = formatted_plan(QUERIES["text_repetition_topgram"](spark, sf_dir))
    assert "Exchange" not in plan, plan
