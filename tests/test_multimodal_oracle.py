"""Preconditions for the multimodal SQL oracles (parity itself runs in the
test_oracle_parity sweep): the fixture payloads must be pure ASCII so
byte-level fake-codec math equals the oracle's character-level math."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.multimodal import (
    multimodal_decode_stats,
    multimodal_frame_sample,
)


def test_fixture_payloads_are_ascii(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    non_ascii = docs.filter(F.octet_length("text") != F.length("text")).count()
    assert non_ascii == 0, (
        "multimodal oracles equate byte and char offsets; a non-ASCII fixture "
        "would need the oracle rewritten over encode(text) blobs"
    )


def test_frame_sample_contract(spark, sf_dir):
    fr = multimodal_frame_sample(spark, sf_dir)
    agg = fr.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.min("frame_idx").alias("lo"), F.max("frame_idx").alias("hi")
    )
    bad = agg.filter((F.col("n") > 8) | (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
    assert bad.isEmpty()


def test_decode_stats_ranges(spark, sf_dir):
    st = multimodal_decode_stats(spark, sf_dir)
    bad = st.filter(
        ~F.col("width").between(64, 255)
        | ~F.col("height").between(64, 255)
        | (F.col("channels") != 3)
        | ~F.col("feature_argmax").between(0, 15)
    )
    assert bad.isEmpty()
