"""Retraction-MV laws beyond the oracle equivalence row: group migration
retracts the old group, tombstones retract without adding, stale rows
produce no delta, and the batch-id fence makes replay a no-op."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd

from cdc_postgresql_clickhouse_spark.streaming.mv import ingest_batch_mv, read_mv

_SCHEMA = "user_id long, us long, eid long, event_type string, cents long"


def _mv(spark, path) -> dict:
    return {
        r.last_event_type: (r.n_users, r.sum_cents)
        for r in read_mv(spark, path).collect()
    }


def test_planted_retraction_semantics(spark):
    tmp = tempfile.mkdtemp(prefix="mv_law_")
    try:
        b0 = spark.createDataFrame(
            [(1, 10, 1, "view", 100), (2, 10, 2, "purchase", 200)], _SCHEMA
        )
        ingest_batch_mv(spark, b0, tmp, batch_id=0)
        assert _mv(spark, tmp) == {"view": (1, 100), "purchase": (1, 200)}

        # user 1 migrates view -> purchase (old group must LOSE its row);
        # user 2 is tombstoned (retract with no addition)
        b1 = spark.createDataFrame(
            [(1, 20, 3, "purchase", 300), (2, 20, 4, "error", 0)], _SCHEMA
        )
        ingest_batch_mv(spark, b1, tmp, batch_id=1)
        assert _mv(spark, tmp) == {"purchase": (1, 300)}

        # replay of batch 1: fenced to a no-op (deltas are not idempotent)
        ingest_batch_mv(spark, b1, tmp, batch_id=1)
        assert _mv(spark, tmp) == {"purchase": (1, 300)}

        # stale delivery: an OLDER change for user 1 loses the version
        # arg-max and must produce no delta
        b2 = spark.createDataFrame([(1, 15, 5, "view", 999)], _SCHEMA)
        ingest_batch_mv(spark, b2, tmp, batch_id=2)
        assert _mv(spark, tmp) == {"purchase": (1, 300)}

        # un-delete: user 2 comes back — the MV regains the contribution
        b3 = spark.createDataFrame([(2, 30, 6, "view", 50)], _SCHEMA)
        ingest_batch_mv(spark, b3, tmp, batch_id=3)
        assert _mv(spark, tmp) == {"purchase": (1, 300), "view": (1, 50)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(f"{tmp}.lock", ignore_errors=True)


def test_out_of_order_split_converges_to_batch_groupby(spark, sf_dir):
    """Three parity splits of real events in scrambled order: the MV must
    equal the one-shot group-by over the soft-deleted current state."""
    from pyspark.sql import functions as F

    from cdc_postgresql_clickhouse_spark.queries.cdc import cdc_soft_delete_state
    from cdc_postgresql_clickhouse_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").alias("eid"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    tmp = tempfile.mkdtemp(prefix="mv_ooo_")
    try:
        for i, part in enumerate((2, 0, 1)):  # scrambled arrival order
            ingest_batch_mv(
                spark, ev.filter(F.col("eid") % 3 == part), tmp, batch_id=i
            )
        got = (
            read_mv(spark, tmp).toPandas()
            .sort_values("last_event_type").reset_index(drop=True)
        )
        want = (
            cdc_soft_delete_state(spark, sf_dir)
            .groupBy(F.col("last_event_type"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_users"),
                F.sum(F.floor(F.col("last_value") * 100 + F.lit(0.5)).cast("long"))
                .cast("long").alias("sum_cents"),
            )
            .toPandas().sort_values("last_event_type").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(f"{tmp}.lock", ignore_errors=True)
