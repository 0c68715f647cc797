"""transformWithStateInPandas operator: streaming state equals the batch
aggregate over the same rows, including across a two-drain (restart) split —
state survives in the checkpoint, not the process."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.sources.registry import load_table
from cdc_postgresql_clickhouse_spark.streaming.stateful import (
    tws_available,
    user_lifetime_stats,
)


def test_missing_protobuf_raises_clean_importerror(spark):
    if tws_available():
        pytest.skip("protobuf installed; covered by the equivalence test")
    with pytest.raises(ImportError, match="protobuf"):
        user_lifetime_stats(spark.range(1).withColumnRenamed("id", "user_id"))


@pytest.mark.skipif(not tws_available(), reason="protobuf not installed")
def test_tws_lifetime_stats_equals_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    half = ev.count() // 2
    first = ev.limit(half)
    first.write.parquet(src)

    def drain():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            user_lifetime_stats(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    # second tranche lands as a new file; the restarted query must resume the
    # per-user ValueState from the checkpoint, not from zero
    ev.subtract(first).write.mode("append").parquet(src)
    drain()

    # latest emission per user (max n_events is monotone per user)
    got = (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
    )
    want = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    joined = got.alias("g").join(want.alias("w"), "user_id", "full").select(
        "user_id",
        F.col("g.n_events").alias("gn"),
        F.col("w.n_events").alias("wn"),
        (F.abs(F.col("g.total_value") - F.col("w.total_value")) < 1e-6).alias("tot_ok"),
    )
    bad = joined.filter(
        F.col("gn").isNull() | F.col("wn").isNull() | (F.col("gn") != F.col("wn")) | ~F.col("tot_ok")
    )
    assert bad.isEmpty(), bad.take(5)
