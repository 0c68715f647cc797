"""Fixture-layout resilience for the events table (the round-2 regression
class): whatever physical timestamp layout a fixture generation ships —
tz-aware TIMESTAMP or TIMESTAMP_NTZ — load_table must normalize `ts` to
tz-aware TIMESTAMP with identical values, so unix_micros and withWatermark
downstream never see an NTZ column."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def _roundtrip(spark, tmp_path, df, name):
    path = str(tmp_path / name)
    df.write.parquet(path + "/events.parquet")
    return load_table(spark, path, "events")


def test_ntz_layout_normalized(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    ntz = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = _roundtrip(spark, tmp_path, ntz, "ntz")
    assert isinstance(got.schema["ts"].dataType, TimestampType)
    # UTC session: values identical to the canonical read
    a = ev.select("event_id", F.unix_micros("ts").alias("us"))
    b = got.select("event_id", F.unix_micros("ts").alias("us"))
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_native_layout_passthrough(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    got = _roundtrip(spark, tmp_path, ev, "native")
    assert isinstance(got.schema["ts"].dataType, TimestampType)
    assert got.count() == ev.count()


def test_downstream_surfaces_accept_any_layout(spark, sf_dir, tmp_path):
    """The two round-2 failure points — unix_micros and withWatermark — must
    work directly on the loaded table."""
    ntz = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    got = _roundtrip(spark, tmp_path, ntz, "ntz2")
    got.select(F.unix_micros("ts")).first()  # P6 path
    got.withWatermark("ts", "10 minutes")    # ST6 path (batch plan build)
