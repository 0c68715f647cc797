"""Winnowing fingerprint guarantees (Schleimer et al. 2003): any substring
match of length >= k + w - 1 shares a selected fingerprint; matches shorter
than k may not."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.winnow import _GRAMS, _MINS, K_GRAM, WINDOW


def _fps(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, ns string")
    out = (
        df.select("doc_id", F.expr(_GRAMS).alias("grams"))
        .select("doc_id", F.array_sort(F.array_distinct(F.expr(_MINS))).alias("fps"))
        .collect()
    )
    return {r.doc_id: set(r.fps) for r in out}

def test_shared_long_substring_shares_fingerprint(spark):
    shared = "the quick brown fox jumps"   # len 25 >= k + w - 1 = 11
    fps = _fps(spark, [f"aaa bbb {shared} ccc", f"zzz {shared} qqq xxx yyy"])
    assert fps[0] & fps[1], "winnowing guarantee violated"

def test_disjoint_texts_share_nothing(spark):
    fps = _fps(spark, ["abcdefgh ijklmnop qrstuvwx", "01234567 89098765 43210123"])
    assert not (fps[0] & fps[1])

def test_short_doc_still_fingerprinted(spark):
    # n_grams in (1, WINDOW): global-min fallback emits exactly one fp
    text = "abcdefghij"  # 10 chars -> 3 grams of 8 < WINDOW=4
    fps = _fps(spark, [text])
    assert len(fps[0]) == 1

def test_below_noise_threshold_empty(spark):
    fps = _fps(spark, ["abc"])  # < K_GRAM chars: no grams, no fingerprints
    assert fps[0] == set()
    assert K_GRAM + WINDOW - 1 == 11  # documented guarantee threshold
