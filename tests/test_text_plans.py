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
