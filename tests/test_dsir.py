"""DSIR importance-weight invariants: the target-language slice must score
higher than the rest (it IS the target distribution), the keep flag is the
sign of the log ratio, and the gram count is exactly unigrams + bigrams."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.dsir import (
    DSIR_TARGET_LANG,
    corpus_dsir_weights,
)
from cdc_postgresql_clickhouse_spark.functions.text import tokens
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def test_dsir_target_slice_scores_higher(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = corpus_dsir_weights(spark, sf_dir).join(docs, "doc_id")
    # normalize per gram so long docs don't dominate the comparison
    per_gram = (F.col("dsir_logratio_micro") / F.col("n_grams")).alias("pg")
    means = {
        r.is_target: r.m
        for r in out.select((F.col("lang") == DSIR_TARGET_LANG).alias("is_target"), per_gram)
        .groupBy("is_target")
        .agg(F.avg("pg").alias("m"))
        .collect()
    }
    assert means[True] > means[False], means


def test_dsir_keep_is_sign_of_logratio(spark, sf_dir):
    rows = corpus_dsir_weights(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.keep == (r.dsir_logratio_micro > 0), r


def test_dsir_gram_count_is_unigrams_plus_bigrams(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ntoks = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("nt")
    )
    got = corpus_dsir_weights(spark, sf_dir).join(ntoks, "doc_id").collect()
    for r in got:
        expected = r.nt + max(r.nt - 1, 0)
        assert r.n_grams == expected, r


def test_ccnet_terciles_are_balanced_and_ordered(spark, sf_dir):
    from cdc_postgresql_clickhouse_spark.queries.text_ext import text_ccnet_buckets

    rows = text_ccnet_buckets(spark, sf_dir).collect()
    assert rows
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        sizes = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            sizes[r.ppl_bucket] += 1
        # integer tercile split: head = floor(n/3), head+middle = floor(2n/3)
        assert sizes["head"] == n // 3, (lang, sizes, n)
        assert sizes["head"] + sizes["middle"] == (2 * n) // 3, (lang, sizes, n)
        # ordering: every head score <= every middle score <= every tail score
        def scores(b):
            return [r.nll_micro_per_tok for r in rs if r.ppl_bucket == b]
        h, m, t = scores("head"), scores("middle"), scores("tail")
        if h and m:
            assert max(h) <= min(m), lang
        if m and t:
            assert max(m) <= min(t), lang
