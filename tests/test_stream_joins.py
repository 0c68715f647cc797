"""Stream-stream watermarked interval join: the same function verified
against DuckDB in batch (query `events_purchase_attribution`) runs here as a
genuine two-stream join with deterministic expected pairs."""

from __future__ import annotations

from datetime import datetime, timedelta

from cdc_postgresql_clickhouse_spark.streaming.joins import purchase_attribution_join

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _rows(kind: str, spec: list[tuple[int, int, int]]):
    base = datetime(2024, 1, 1)
    return [
        (eid, base + timedelta(minutes=m), uid, kind, 1.0) for eid, m, uid in spec
    ]


def test_stream_stream_interval_join(spark, tmp_path):
    # user 1: views at minutes 0/5/9/20, purchase at 10 → views 0,5,9 attach
    # user 2: view at 0, purchase at 15 → outside the 10-minute lookback
    views = _rows("view", [(100, 0, 1), (101, 5, 1), (102, 9, 1), (103, 20, 1), (104, 0, 2)])
    purchases = _rows("purchase", [(200, 10, 1), (201, 15, 2)])
    vdir, pdir = str(tmp_path / "v"), str(tmp_path / "p")
    spark.createDataFrame(views, EVENTS_SCHEMA).write.parquet(vdir)
    spark.createDataFrame(purchases, EVENTS_SCHEMA).write.parquet(pdir)

    sv = spark.readStream.schema(EVENTS_SCHEMA).parquet(vdir)
    sp = spark.readStream.schema(EVENTS_SCHEMA).parquet(pdir)
    out = purchase_attribution_join(sv, sp)
    q = (
        out.writeStream.format("memory")
        .queryName("attr_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT purchase_id, view_id FROM attr_sink").collect()
    pairs = {(r.purchase_id, r.view_id) for r in got}
    assert pairs == {(200, 100), (200, 101), (200, 102)}
