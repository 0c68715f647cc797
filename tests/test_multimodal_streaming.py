"""Tests for the multimodal mapInPandas plumbing, streaming windows, the
stateful dedup operator, and the SMT router."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.operators.multimodal import (
    DECODED_SCHEMA,
    FEATURE_DIM,
    blob_table,
    decode_blobs,
    sample_frames,
)
from cdc_postgresql_clickhouse_spark.operators.router import fanout_write, route_topic
from cdc_postgresql_clickhouse_spark.sources.registry import load_table
from cdc_postgresql_clickhouse_spark.streaming.windows import (
    session_counts,
    stateful_max_version_dedup,
    tumbling_counts,
)


def test_blob_decode_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    blobs = blob_table(docs)
    decoded = decode_blobs(blobs)
    assert decoded.schema == DECODED_SCHEMA
    rows = decoded.collect()
    assert len(rows) == 50
    for r in rows:
        assert 64 <= r["width"] < 256 and r["channels"] == 3
        assert len(r["feature"]) == FEATURE_DIM
        assert abs(sum(r["feature"]) - 1.0) < 0.01  # normalized histogram
    # determinism: same payload -> same features
    again = {r["doc_id"]: r["feature"] for r in decode_blobs(blobs).collect()}
    assert all(again[r["doc_id"]] == r["feature"] for r in rows)


def test_frame_sampling(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    frames = sample_frames(blob_table(docs), every_n_bytes=64, max_frames=4)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"doc_id", "frame_idx", "frame_md5"}
    assert (pdf.groupby("doc_id")["frame_idx"].max() <= 3).all()
    assert pdf["frame_md5"].str.len().eq(32).all()


def _event_stream(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev_stream")
    ev.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(ev.schema).parquet(path)


def test_streaming_tumbling_and_session(spark, sf_dir, tmp_path):
    stream = _event_stream(spark, sf_dir, tmp_path)
    out1 = str(tmp_path / "tumbling")
    q = (
        tumbling_counts(stream)
        .writeStream.format("parquet")
        .option("path", out1)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # watermark append-mode: windows still open at end-of-stream are withheld;
    # batch twin gives the upper bound
    batch = load_table(spark, sf_dir, "events").groupBy(
        F.window("ts", "5 minutes"), "event_type"
    ).count()
    got = spark.read.parquet(out1)
    assert 0 < got.count() <= batch.count()

    out2 = str(tmp_path / "sessions")
    q2 = (
        session_counts(stream)
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    sess = spark.read.parquet(out2)
    assert sess.count() > 0
    assert sess.filter(F.col("session_end") < F.col("session_start")).count() == 0


def test_stateful_max_version_dedup(spark, sf_dir, tmp_path):
    stream = _event_stream(spark, sf_dir, tmp_path)
    out = str(tmp_path / "dedup_out")
    q = (
        stateful_max_version_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    ev = load_table(spark, sf_dir, "events")
    # within one batch per key, versions are emitted strictly increasing,
    # and every key's max version must be present
    assert got.count() <= ev.count()
    max_emitted = {r["user_id"]: r["mv"] for r in got.groupBy("user_id").agg(F.max("version").alias("mv")).collect()}
    max_actual = {r["user_id"]: r["mv"] for r in ev.groupBy("user_id").agg(F.max("event_id").alias("mv")).collect()}
    assert max_emitted == max_actual


def test_route_and_fanout(spark, tmp_path):
    df = spark.createDataFrame(
        [("sql_topic.public.bookings", 1), ("sql_topic.public.payments", 2)], ["topic", "v"]
    )
    routed = route_topic(df)
    assert {r["sink_table"] for r in routed.collect()} == {"bookings_changes", "payments_changes"}
    base = str(tmp_path / "fanout")
    fanout_write(routed, base)
    assert sorted(os.listdir(base))[:1] == ["_SUCCESS"] or any(
        d.startswith("sink_table=") for d in os.listdir(base)
    )
    back = spark.read.parquet(base)
    assert back.filter(F.col("sink_table") == "bookings_changes").count() == 1


def test_resize_blobs(spark, sf_dir):
    from cdc_postgresql_clickhouse_spark.operators.multimodal import blob_table, resize_blobs

    docs = load_table(spark, sf_dir, "documents").limit(50)
    blobs = blob_table(docs)
    resized = resize_blobs(blobs, target_w=64, target_h=64)
    rows = resized.collect()
    assert len(rows) == 50
    budget = 64 * 64 // 64
    for r in rows:
        assert r["width"] == 64 and r["height"] == 64
        assert 1 <= r["resized_bytes"] <= budget
        assert len(r["resized_md5"]) == 32
    # determinism: same input -> same fingerprints
    again = {r["doc_id"]: r["resized_md5"] for r in resize_blobs(blobs, 64, 64).collect()}
    assert {r["doc_id"]: r["resized_md5"] for r in rows} == again
