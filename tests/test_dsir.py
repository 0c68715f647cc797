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
