"""Streaming/batch sessionization equivalence (survey ST6; VERDICT r2 item 8).

The batch `events_sessionize` (lag -> gap flag -> running-sum index) and the
streaming `session_counts` (native F.session_window) implement the same
30-minute-gap semantics; this drives BOTH over the same fixture and asserts
the session sets are identical.

Watermark flush: append-mode session windows only emit once the watermark
passes the session end, so a single availableNow drain withholds the tail
sessions. Standard pattern: drain, append a far-future sentinel event, drain
again from the same checkpoint — the sentinel advances the (global) watermark
past every real session; the sentinel user is excluded from comparison.

Boundary note: batch compares second-floored gaps (`gap > 1800` keeps the
session) while session_window uses full-precision ts; the fixture has no gap
within 5 s of the 1800 s boundary (checked in-fixture below), so neither the
floor nor the open/closed boundary can flip a session split here.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_postgresql_clickhouse_spark.queries import all_queries
from cdc_postgresql_clickhouse_spark.sources.registry import load_table
from cdc_postgresql_clickhouse_spark.streaming.windows import session_counts

SENTINEL_USER = -999


def test_streaming_session_counts_equals_batch_sessionize(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")

    # fixture precondition for exact equivalence (see module docstring)
    gaps = (
        ev.withColumn(
            "gap",
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(Window.partitionBy("user_id").orderBy("ts"))),
        )
        .filter((F.col("gap") > 1795) & (F.col("gap") < 1805))
        .count()
    )
    assert gaps == 0, "fixture grew a near-boundary gap; revisit the equivalence tolerance"

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev.write.mode("overwrite").parquet(src)

    def drain():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            session_counts(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    # sentinel: push the watermark past every real session, flushing the tail
    far_future = ev.select(F.max("ts")).first()[0]
    spark.createDataFrame([(SENTINEL_USER, far_future)], "user_id long, ts timestamp").withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 30 DAYS")
    ).write.mode("append").parquet(src)
    drain()

    streamed = (
        spark.read.parquet(out)
        .filter(F.col("user_id") != SENTINEL_USER)
        .select(
            "user_id",
            F.floor(F.unix_timestamp("session_start")).cast("long").alias("session_start_epoch"),
            # session_end = last event ts + gap; subtracting the integer gap
            # commutes with floor, recovering the batch duration exactly
            (
                F.floor(F.unix_timestamp("session_end"))
                - F.lit(1800)
                - F.floor(F.unix_timestamp("session_start"))
            ).cast("long").alias("duration_s"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )
    batch = (
        all_queries()["events_sessionize"](spark, sf_dir)
        .select(
            "user_id",
            F.col("session_start_epoch").cast("long"),
            F.col("duration_s").cast("long"),
            F.col("n_events").cast("long"),
        )
    )
    only_stream = streamed.exceptAll(batch)
    only_batch = batch.exceptAll(streamed)
    assert only_stream.isEmpty() and only_batch.isEmpty(), (
        f"stream-only: {only_stream.take(5)}; batch-only: {only_batch.take(5)}"
    )


def test_streaming_tumbling_counts_equals_batch(spark, sf_dir, tmp_path):
    """Same drain/sentinel/re-drain pattern for the tumbling window: the
    streaming operator must reproduce the batch events_tumbling_5min
    aggregation exactly (per (window_start, event_type) counts)."""
    from cdc_postgresql_clickhouse_spark.streaming.windows import tumbling_counts

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    src = str(tmp_path / "tsrc")
    out = str(tmp_path / "tout")
    ckpt = str(tmp_path / "tckpt")
    ev.write.mode("overwrite").parquet(src)

    def drain():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            tumbling_counts(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    far_future = ev.select(F.max("ts")).first()[0]
    spark.createDataFrame(
        [("__sentinel__", far_future)], "event_type string, ts timestamp"
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS")).write.mode("append").parquet(src)
    drain()

    streamed = (
        spark.read.parquet(out)
        .filter(F.col("event_type") != "__sentinel__")
        .select(
            F.floor(F.unix_timestamp("window_start")).cast("long").alias("bucket_epoch"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
        )
    )
    batch = all_queries()["events_tumbling_5min"](spark, sf_dir)
    batch = batch.select(
        F.col(batch.columns[0]).cast("long").alias("bucket_epoch"),
        F.col("event_type"),
        F.col("n_events").cast("long"),
    )
    only_s = streamed.exceptAll(batch)
    only_b = batch.exceptAll(streamed)
    assert only_s.isEmpty() and only_b.isEmpty(), (
        f"stream-only: {only_s.take(5)}; batch-only: {only_b.take(5)}"
    )
