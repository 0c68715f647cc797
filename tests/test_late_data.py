"""Watermark late-data drop: the streamed input contains late copies, the
emitted aggregation must count only the on-time originals."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.queries.streaming_queries import (
    LATE_MOD,
    LATE_RESIDUE,
    streaming_late_data_drop,
)
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def test_late_copies_exist_and_are_dropped(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_late = ev.filter(F.col("event_id") % LATE_MOD == LATE_RESIDUE).count()
    assert n_late > 0, "fixture must actually produce late copies"
    out = streaming_late_data_drop(spark, sf_dir)
    total = out.agg(F.sum("n_events")).first()[0]
    # dropped: totals equal the originals; a leak would add up to n_late
    assert total == n_events, (total, n_events, n_late)
